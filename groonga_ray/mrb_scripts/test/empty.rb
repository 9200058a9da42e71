# mruby smoke-test fixture: evaluates to nil (mirrors the
# reference's bundled lib/mrb/scripts/test/empty.rb)
