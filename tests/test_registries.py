"""Extension surface: normalizer / function / command registries
(mirrors grn_normalizer_register, grn_proc_create PROC_FUNCTION /
PROC_COMMAND; tokenizer + scorer registries are covered elsewhere)."""

import numpy as np
import pyarrow as pa

from groonga_ray import cli
from groonga_ray.functions import CUSTOM_FUNCTIONS, register_function
from groonga_ray.normalize import CUSTOM_NORMALIZERS, normalize_as, register_normalizer
from groonga_ray.script import eval_filter, parse_filter


def test_register_normalizer_dispatch():
    def shout(text):
        up = text.upper()
        return up, np.zeros(len(up), np.uint8), np.zeros(len(up), bool)

    register_normalizer("NormalizerShout", shout)
    try:
        norm, _, _ = normalize_as("abc", "NormalizerShout")
        assert norm == "ABC"
        assert normalize_as("A b", "NormalizerAuto")[0] == "ab"
    finally:
        CUSTOM_NORMALIZERS.pop("NormalizerShout", None)


def test_register_function_in_filter():
    def double_plus(col, k):
        import pyarrow.compute as pc

        return pc.add(pc.multiply(col, 2), k)

    register_function("double_plus", double_plus)
    try:
        batch = pa.table({"x": pa.array([1, 2, 3])})
        out = eval_filter(parse_filter("double_plus(x, 10) > 13"), batch)
        assert out.to_pylist() == [False, True, True]
    finally:
        CUSTOM_FUNCTIONS.pop("double_plus", None)


def test_register_command_dispatch(capsys):
    seen = {}

    def hello(argv):
        seen["argv"] = argv
        print("hello-from-plugin")

    cli.register_command("hello", hello)
    try:
        cli.main(["hello", "--x", "1"])
        assert seen["argv"] == ["--x", "1"]
        assert "hello-from-plugin" in capsys.readouterr().out
    finally:
        cli.CUSTOM_COMMANDS.pop("hello", None)
