"""DDL + admin command lifecycle over HTTP: table_create →
column_create → load (materialize) → select → load (delta) →
table_rename/remove, define_selector, table_tokenize, cache_limit +
select cache semantics, tokenizer/normalizer lists, log and lock
commands (proc_table_create / proc_column_create / proc_define_selector
/ proc_cache_limit, lib/proc.c)."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from groonga_ray.server import CommandServer


@pytest.fixture()
def srv(ray_session, tmp_path):
    server = CommandServer(data_dir=str(tmp_path / "data"))
    host, port = server.start()
    yield server, f"http://{host}:{port}"
    server.stop()


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=30) as r:
            return json.loads(r.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        return json.loads(e.read().decode("utf-8"))


def _post(base, path, body):
    req = urllib.request.Request(base + path, data=body.encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        return json.loads(e.read().decode("utf-8"))


RECORDS = [
    {"_key": "a", "title": "ray data engine", "body": "fulltext over parquet"},
    {"_key": "b", "title": "inverted index", "body": "posting lists and skips"},
    {"_key": "c", "title": "parquet tables", "body": "columnar ray batches"},
]


def test_create_load_select_lifecycle(srv, tmp_path):
    _, base = srv
    assert _get(base, "/d/table_create?name=Entries&flags=TABLE_PAT_KEY"
                      "&default_tokenizer=TokenBigram")[1] is True
    # duplicate create fails
    assert _get(base, "/d/table_create?name=Entries")[0][0] == -22
    assert _get(base, "/d/column_create?table=Entries&name=title&type=ShortText")[1] is True
    assert _get(base, "/d/column_create?table=Entries&name=body&type=Text")[1] is True
    # an index column on title only
    assert _get(base, "/d/column_create?table=Entries&name=idx&type=Entries"
                      "&flags=COLUMN_INDEX%7CWITH_POSITION&source=title")[1] is True

    # pending table: listed, selects empty
    env = _get(base, "/d/table_list")
    assert any(r[1] == "Entries" and "TABLE_PAT_KEY" in r[3]
               for r in env[1][1:])
    assert _get(base, "/d/select?table=Entries&query=ray&limit=0")[1][0][0][0] == 0

    # first load materializes with server-assigned _id
    env = _post(base, "/d/load?table=Entries", json.dumps(RECORDS))
    assert env[1] == 3
    env = _get(base, "/d/select?table=Entries&query=parquet"
                     "&match_columns=title&output_columns=_id&limit=10")
    assert env[1][0][0][0] == 1  # only title indexed; 'parquet' in one title
    # _key is a scalar column available to filters and output
    env = _get(base, "/d/select?table=Entries&filter=_key%3D%3D%22b%22"
                     "&output_columns=_id,_key&limit=10")
    assert env[1][0][2:] == [[2, "b"]]

    # incremental load continues server-assigned ids
    env = _post(base, "/d/load?table=Entries", json.dumps(
        [{"_key": "d", "title": "parquet again", "body": "delta segment"}]
    ))
    assert env[1] == 1
    env = _get(base, "/d/select?table=Entries&query=parquet&match_columns=title"
                     "&output_columns=_id&sortby=_id&limit=10")
    assert [r[0] for r in env[1][0][2:]] == [3, 4]

    # rename, then remove deletes server-created data
    assert _get(base, "/d/table_rename?name=Entries&new_name=Docs")[1] is True
    assert _get(base, "/d/select?table=Docs&query=parquet&match_columns=title"
                     "&limit=0")[1][0][0][0] == 2
    assert _get(base, "/d/table_remove?name=Docs")[1] is True
    assert _get(base, "/d/select?table=Docs&query=x")[0][0] == -22


def test_define_selector_and_admin_lists(srv):
    _, base = srv
    _get(base, "/d/table_create?name=T")
    _post(base, "/d/load?table=T", json.dumps(RECORDS))
    assert _get(base, "/d/define_selector?name=find_ray&table=T&query=ray"
                      "&output_columns=_id")[1] is True
    env = _get(base, "/d/find_ray")
    assert env[1][0][0][0] >= 1
    # request params override frozen defaults
    env2 = _get(base, "/d/find_ray?query=inverted")
    assert env2[1][0][0][0] == 1

    # tokenizer_list mirrors the reference's builtin registry exactly
    # (tokenizer_list/default conformance); our extras (TokenCodeWord,
    # TokenUvector) stay usable via table_create but join the listing
    # only through plugin registration.
    toks = [r["name"] for r in _get(base, "/d/tokenizer_list")[1]]
    assert "TokenBigram" in toks and "TokenCodeWord" not in toks
    from groonga_ray.tokenize import is_known_tokenizer
    assert is_known_tokenizer("TokenCodeWord")
    norms = [r["name"] for r in _get(base, "/d/normalizer_list")[1]]
    assert "NormalizerAuto" in norms

    got = _get(base, "/d/table_tokenize?table=T&string=ray%20data&mode=ADD")[1]
    assert [t["value"] for t in got] == ["ray", "data"]


def test_cache_limit_and_invalidation(srv):
    server, base = srv
    _get(base, "/d/table_create?name=C")
    _post(base, "/d/load?table=C", json.dumps(RECORDS))
    q = "/d/select?table=C&query=ray&output_columns=_id&limit=10"
    r1 = _get(base, q)[1]
    assert len(server._select_cache) == 1
    r2 = _get(base, q)[1]
    assert r2 == r1
    # cache=no bypasses
    _get(base, q + "&cache=no")
    assert len(server._select_cache) == 1
    # mutation invalidates
    _post(base, "/d/load?table=C", json.dumps([{"_key": "z", "title": "ray z",
                                                "body": "zz"}]))
    assert len(server._select_cache) == 0
    assert _get(base, q)[1][0][0][0] == r1[0][0][0] + 1
    # cache_limit returns previous, 0 disables
    assert _get(base, "/d/cache_limit?max=0")[1] == 100
    _get(base, q)
    assert len(server._select_cache) == 0
    assert _get(base, "/d/cache_limit")[1] == 0


def test_log_lock_quit_cancel(srv):
    _, base = srv
    assert _get(base, "/d/log_level?level=warning")[1] is True
    assert _get(base, "/d/log_level?level=bogus")[0][0] == -22
    assert _get(base, "/d/log_put?level=info&message=hi")[1] is True
    assert _get(base, "/d/log_reopen")[1] is True
    assert _get(base, "/d/clearlock")[1] is True
    assert _get(base, "/d/lock_clear")[1] is True
    assert _get(base, "/d/quit")[1] is True
    assert _get(base, "/d/request_cancel?id=42")[1] == {"id": "42", "canceled": False}


def test_dump_command_stream_roundtrip(ray_session, tmp_path):
    """dump emits a reloadable command stream (proc_dump,
    lib/proc.c:3492): feeding a dump into a FRESH server reproduces the
    same schema + records, so dumping again is byte-identical."""
    from groonga_ray.conformance import ScriptRunner
    from groonga_ray.server import CommandServer

    script = (
        "table_create Memos TABLE_NO_KEY\n"
        "column_create Memos content COLUMN_SCALAR ShortText\n"
        "table_create Terms TABLE_PAT_KEY ShortText "
        "--default_tokenizer TokenBigram --normalizer NormalizerAuto\n"
        "column_create Terms memos_content_index "
        "COLUMN_INDEX|WITH_POSITION Memos content\n"
        "load --table Memos\n"
        '[\n{"content": "Groonga is fast!"},\n{"content": "Ray is wide."}\n]\n'
    )
    s1 = CommandServer(data_dir=str(tmp_path / "a"))
    r1 = ScriptRunner(s1)
    r1.run_script(script)
    dump1 = s1.execute_command("dump", {}) if hasattr(s1, "execute_command") else s1._commands["dump"]({})
    assert "table_create Memos TABLE_NO_KEY" in dump1
    assert 'load --table Memos' in dump1
    assert dump1.rstrip().endswith(
        "column_create Terms memos_content_index COLUMN_INDEX|WITH_POSITION Memos content"
    )

    s2 = CommandServer(data_dir=str(tmp_path / "b"))
    r2 = ScriptRunner(s2)
    r2.run_script(dump1)
    dump2 = s2._commands["dump"]({})
    assert dump2 == dump1
    # and the reloaded index answers the same query
    res = s2._commands["select"]({"table": "Memos", "query": "fast",
                                  "match_columns": "content"})
    assert res[0][0] == [1]
