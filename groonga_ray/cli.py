"""Thin CLI — the analogue of the reference's standalone REPL / command
surface (src/groonga.c:359 do_alone; command dispatch lib/ctx.c:1529).

Commands: build, select, tokenize, normalize, dump-tokens, status.
Run via ``python -m groonga_ray.cli <command> ...`` or submit the whole
thing as a Ray job (``ray job submit -- python -m groonga_ray.cli build ...``).

Owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args):
    from .build import BuildConfig, build_index, sort_build_index

    _ray_init(args.num_cpus)
    cfg = BuildConfig(
        text_columns=tuple(args.columns.split(",")),
        docid_column=args.docid_column,
        n_buckets=args.buckets,
        target_rows_per_shard=args.rows_per_shard,
    )
    if args.sort_by:
        # unsorted ingest: the fused cold path (range sort + in-memory
        # tokenize per range — one corpus pass less than sort-then-build)
        sorted_dir = args.sorted_dir or os.path.join(args.index, "_sorted")
        meta = sort_build_index(
            sorted(args.files), args.sort_by.split(","), sorted_dir,
            args.index, cfg, concurrency=args.concurrency,
        )
    else:
        meta = build_index(sorted(args.files), args.index, cfg, concurrency=args.concurrency)
    print(json.dumps(meta, indent=1))


def cmd_select(args):
    from .engine import IndexedTable, select_v1

    table = IndexedTable(args.index, sorted(args.files), args.docid_column)
    env = select_v1(
        table,
        query=args.query,
        filter=args.filter,
        match_columns=args.match_columns,
        scorer=args.scorer,
        limit=args.limit,
        offset=args.offset,
        output_columns=tuple(args.output_columns.split(",")),
        drilldown=args.drilldown,
    )
    print(json.dumps(env, ensure_ascii=False))


def cmd_serve(args):
    """``groonga --protocol {http,gqtp,memcached}`` analogue
    (src/groonga.c:359 do_alone / server dispatch)."""
    import signal
    import threading

    from .server import CommandServer

    tables = {}
    if args.index and args.files:
        from .engine import IndexedTable

        tables[args.table] = IndexedTable(
            args.index, sorted(args.files), args.docid_column
        )
    stop_event = threading.Event()
    if args.protocol == "memcached":
        from .memcached import MemcachedServer

        server = MemcachedServer(host=args.host, port=args.port)
    else:
        cmd = CommandServer(tables, data_dir=args.data_dir, host=args.host,
                            port=args.port)
        if args.protocol == "gqtp":
            from .gqtp import GqtpServer

            server = GqtpServer(cmd, host=args.host, port=args.port)
        else:
            server = cmd
    host, port = server.start()
    print(json.dumps({"protocol": args.protocol, "host": host, "port": port}),
          flush=True)
    signal.signal(signal.SIGTERM, lambda *_: stop_event.set())
    signal.signal(signal.SIGINT, lambda *_: stop_event.set())
    try:
        stop_event.wait()
    finally:
        server.stop()


def cmd_tokenize(args):
    from .tokenize import tokenize

    stream = tokenize(args.text, args.tokenizer, mode=args.mode.lower())
    out = [
        {"value": t.term, "position": t.pos,
         "force_prefix": bool(stream.force_prefix and i == len(stream.tokens) - 1)}
        for i, t in enumerate(stream.tokens)
    ]
    print(json.dumps([[0, 0.0, 0.0], out], ensure_ascii=False))


def cmd_normalize(args):
    from .normalize import normalize

    norm, classes, blanks = normalize(args.text)
    print(json.dumps([[0, 0.0, 0.0], {"normalized": norm, "types": classes.tolist()}],
                     ensure_ascii=False))


def cmd_load(args):
    """The reference's `load` (lib/proc.c:1371): ingest JSON records
    (array-of-objects, or JSON-lines with --jsonl) into a Parquet
    table ready for build."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    with open(args.input) as fh:
        if args.jsonl:
            records = [json.loads(line) for line in fh if line.strip()]
        else:
            records = json.load(fh)
    table = pa.Table.from_pylist(records)
    if args.sort_by:
        import pyarrow.compute as pc

        keys = [(c, "ascending") for c in args.sort_by.split(",")]
        table = table.take(pc.sort_indices(table, sort_keys=keys))
    pq.write_table(table, args.output)
    print(json.dumps({"rows": table.num_rows, "columns": table.column_names}))


def cmd_dump(args):
    """The reference's `dump` (lib/proc.c:3492): emit the table as a
    reloadable stream — a schema line followed by JSON-lines records
    (feed the records back through `load --jsonl` to reload)."""
    import pyarrow.parquet as pq

    for f in sorted(args.files):
        pf = pq.ParquetFile(f)
        schema = {name: str(pf.schema_arrow.field(name).type) for name in pf.schema_arrow.names}
        print(json.dumps({"cmd": "table_create", "source": f, "schema": schema}))
        remaining = args.limit if args.limit >= 0 else None
        for batch in pf.iter_batches(batch_size=1024):
            rows = batch.to_pylist()
            if remaining is not None:
                rows = rows[:remaining]
                remaining -= len(rows)
            for r in rows:
                print(json.dumps(r, ensure_ascii=False, default=str))
            if remaining == 0:
                break


def cmd_suggest_learn(args):
    """groonga-suggest-learner analogue
    (src/suggest/groonga_suggest_learner.c): replay a query-log parquet
    of event rows (seq, doc_id, ord, time_us, item, is_submit) into the
    learned items/pairs dataset."""
    import ray.data

    from .pipelines.suggest import learn_to_dir

    _ray_init(args.num_cpus)
    events = ray.data.read_parquet(sorted(args.files))
    learn_to_dir(events, args.dataset, weight=args.weight)
    print(json.dumps({"dataset": args.dataset}))


def cmd_suggest(args):
    """The `suggest` command (plugins/suggest/suggest.c:548-627):
    --types complete|correct|suggest over a learned dataset."""
    from .pipelines.suggest import run_suggest

    out = run_suggest(
        args.dataset,
        args.types,
        args.query,
        sortby=args.sortby,
        output_columns=tuple(args.output_columns.split(",")),
        offset=args.offset,
        limit=args.limit,
        frequency_threshold=args.frequency_threshold,
        conditional_probability_threshold=args.conditional_probability_threshold,
        prefix_search=args.prefix_search,
        similar_search=args.similar_search,
    )
    env = {}
    for typ, tbl in out.items():
        cols = [[n, str(tbl.column(n).type)] for n in tbl.column_names]
        rows = [list(r) for r in zip(*[tbl.column(n).to_pylist() for n in tbl.column_names])]
        env[typ] = [[tbl.num_rows], cols, *rows]
    print(json.dumps(env, ensure_ascii=False))


def cmd_status(args):
    import os

    meta_path = os.path.join(args.index, "meta.json")
    with open(meta_path) as fh:
        print(json.dumps(json.load(fh), indent=1))


def cmd_check(args):
    from .build import check_index

    print(json.dumps(check_index(args.index), indent=1))


def cmd_truncate(args):
    from .build import truncate_index

    truncate_index(args.index)
    print(json.dumps([[0, 0.0, 0.0], True]))


def cmd_register(args):
    """proc_register analogue. With trailing arguments, dispatches
    them as a follow-up command after loading — so a plugin-registered
    command is usable in the same invocation (the REPL pattern:
    ``register x`` then the command)."""
    from .plugin import register

    register(args.path)
    print(json.dumps([[0, 0.0, 0.0], True]))
    if args.rest:
        main(args.rest)


CUSTOM_COMMANDS: dict[str, object] = {}


def register_command(name: str, fn) -> None:
    """Plugin surface (grn_command_register / grn_proc_create
    PROC_COMMAND): ``fn(argv: list[str]) -> None`` dispatched before
    the built-in subcommands when ``name`` is the first CLI token."""
    CUSTOM_COMMANDS[name] = fn


def main(argv=None):
    import sys as _sys

    raw = list(_sys.argv[1:] if argv is None else argv)
    if raw and raw[0] in CUSTOM_COMMANDS:
        CUSTOM_COMMANDS[raw[0]](raw[1:])
        return
    p = argparse.ArgumentParser(prog="groonga_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--index", required=True)
    b.add_argument("--columns", default="content")
    b.add_argument("--docid-column", default=None)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--rows-per-shard", type=int, default=None)  # None = auto from parquet metadata (~8M tokens/shard)
    b.add_argument("--concurrency", type=int, default=None)
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--sort-by", default=None,
                   help="comma-separated key columns for UNSORTED input: "
                        "runs the fused distributed sort + build "
                        "(docids = global key rank)")
    b.add_argument("--sorted-dir", default=None,
                   help="where the fused path writes the key-sorted corpus "
                        "(default <index>/_sorted); the engine serves from it")
    b.add_argument("files", nargs="+")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("select")
    s.add_argument("--index", required=True)
    s.add_argument("--docid-column", default=None)
    s.add_argument("--query", default=None)
    s.add_argument("--filter", default=None)
    s.add_argument("--match-columns", dest="match_columns", default=None)
    s.add_argument("--scorer", default=None)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--output-columns", dest="output_columns", default="_id,_score")
    s.add_argument("--drilldown", default=None)
    s.add_argument("files", nargs="+")
    s.set_defaults(fn=cmd_select)

    t = sub.add_parser("tokenize")
    t.add_argument("tokenizer")
    t.add_argument("text")
    t.add_argument("--mode", default="ADD")
    t.set_defaults(fn=cmd_tokenize)

    n = sub.add_parser("normalize")
    n.add_argument("text")
    n.set_defaults(fn=cmd_normalize)

    ld = sub.add_parser("load")
    ld.add_argument("input")
    ld.add_argument("output")
    ld.add_argument("--jsonl", action="store_true")
    ld.add_argument("--sort-by", default=None, help="comma-separated key columns")
    ld.set_defaults(fn=cmd_load)

    dp = sub.add_parser("dump")
    dp.add_argument("files", nargs="+")
    dp.add_argument("--limit", type=int, default=-1)
    dp.set_defaults(fn=cmd_dump)

    sv = sub.add_parser("serve")
    sv.add_argument("--protocol", default="http",
                    choices=["http", "gqtp", "memcached"])
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=0)
    sv.add_argument("--index", default=None)
    sv.add_argument("--table", default="documents")
    sv.add_argument("--docid-column", dest="docid_column", default=None)
    sv.add_argument("--data-dir", dest="data_dir", default=None)
    sv.add_argument("files", nargs="*")
    sv.set_defaults(fn=cmd_serve)

    st = sub.add_parser("status")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_status)

    ck = sub.add_parser("check")
    ck.add_argument("--index", required=True)
    ck.set_defaults(fn=cmd_check)

    tr = sub.add_parser("truncate")
    tr.add_argument("--index", required=True)
    tr.set_defaults(fn=cmd_truncate)

    rg = sub.add_parser("register")
    rg.add_argument("path", help="dotted module name or .py file")
    rg.add_argument("rest", nargs=argparse.REMAINDER)
    rg.set_defaults(fn=cmd_register)

    sl = sub.add_parser("suggest-learn")
    sl.add_argument("--dataset", required=True)
    sl.add_argument("--weight", type=int, default=1)
    sl.add_argument("--num-cpus", type=int, default=None)
    sl.add_argument("files", nargs="+")
    sl.set_defaults(fn=cmd_suggest_learn)

    sg = sub.add_parser("suggest")
    sg.add_argument("--dataset", required=True)
    sg.add_argument("--types", required=True)
    sg.add_argument("--query", required=True)
    sg.add_argument("--sortby", default="-_score")
    sg.add_argument("--output-columns", dest="output_columns", default="_key,_score")
    sg.add_argument("--offset", type=int, default=0)
    sg.add_argument("--limit", type=int, default=10)
    sg.add_argument("--frequency-threshold", type=int, default=100)
    sg.add_argument(
        "--conditional-probability-threshold", type=float, default=0.2
    )
    sg.add_argument("--prefix-search", default="auto", choices=["yes", "no", "auto"])
    sg.add_argument("--similar-search", default="auto", choices=["yes", "no", "auto"])
    sg.set_defaults(fn=cmd_suggest)

    args = p.parse_args(argv)
    args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    if __package__:
        # run via `python -m groonga_ray.cli`: delegate to the canonical
        # module object so plugins that import groonga_ray.cli register
        # into the same CUSTOM_COMMANDS the dispatcher consults
        from groonga_ray.cli import main as _main

        _main()
    else:
        main()
