"""Plugin loading (grn_plugin_register analogue): .py file plugins,
plugin_register hook, idempotent re-register, CLI register + follow-up
command dispatch, and the server's register/table_list/column_list
commands."""

import json
import subprocess
import sys
import urllib.request

import pytest

from groonga_ray import plugin

PLUGIN_SRC = '''
import numpy as np
from groonga_ray.search import register_scorer

CALLS = []

def plugin_register():
    CALLS.append("registered")
    # fn(tf, df, df_estimate, dl, n_docs, avgdl) -> scores
    register_scorer(
        "plugin_const_{tag}",
        lambda tf, df, df_est, dl, n_docs, avgdl: np.full(len(tf), 7.0),
    )
'''


def _write_plugin(tmp_path, tag):
    p = tmp_path / f"myplugin_{tag}.py"
    p.write_text(PLUGIN_SRC.replace("{tag}", tag))
    return str(p)


def test_register_file_plugin_runs_hook(tmp_path):
    path = _write_plugin(tmp_path, "a")
    mod = plugin.register(path)
    assert mod.CALLS == ["registered"]
    from groonga_ray.search import CUSTOM_SCORERS

    assert "plugin_const_a" in CUSTOM_SCORERS
    # idempotent: second register returns cached module, no re-run
    mod2 = plugin.register(path)
    assert mod2 is mod and mod.CALLS == ["registered"]
    assert path in [p for p in plugin.loaded_plugins()]
    assert plugin.unregister(path) is True
    assert plugin.unregister(path) is False


def test_register_dotted_module():
    mod = plugin.register("json")
    assert mod is json or mod.__name__ == "json"
    plugin.unregister("json")


def test_cli_register_then_custom_command(tmp_path):
    cmd_plugin = tmp_path / "cmdplug.py"
    cmd_plugin.write_text(
        "from groonga_ray.cli import register_command\n"
        "def plugin_register():\n"
        "    register_command('hello', lambda argv: print('hello ' + argv[0]))\n"
    )
    out = subprocess.run(
        [sys.executable, "-m", "groonga_ray.cli", "register", str(cmd_plugin),
         "hello", "world"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    assert json.loads(lines[0])[1] is True
    assert lines[1] == "hello world"


@pytest.fixture(scope="module")
def srv(ray_session, tmp_path_factory):
    from groonga_ray.build import BuildConfig, build_index
    from groonga_ray.engine import IndexedTable
    from groonga_ray.server import CommandServer

    index_dir = str(tmp_path_factory.mktemp("plugsrv"))
    files = ["/root/testdata/sf0.001/documents.parquet"]
    build_index(
        files, index_dir,
        BuildConfig(text_columns=("text",), docid_column="doc_id", n_buckets=2),
    )
    server = CommandServer({"documents": IndexedTable(index_dir, files, "doc_id")})
    host, port = server.start()
    yield server, f"http://{host}:{port}"
    server.stop()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read().decode("utf-8"))


def test_server_table_and_column_list(srv):
    _, base = srv
    env = _get(base, "/d/table_list")
    body = env[1]
    # reference shape: header row first, then one row per table
    assert body[0][0] == ["id", "UInt32"] and body[0][1] == ["name", "ShortText"]
    assert body[1][1] == "documents" and "PAT_KEY" in body[1][3]

    env = _get(base, "/d/column_list?table=documents")
    rows = env[1][1:]
    byname = {r[1]: r for r in rows}
    assert set(byname) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r[5] == "documents" for r in rows)


def test_plugin_scorer_usable_in_match_columns(srv, tmp_path):
    """A scorer registered by an HTTP-loaded plugin is callable in
    match_columns, with or without the scorer_ prefix."""
    _, base = srv
    plug = tmp_path / "scorerplug.py"
    plug.write_text(
        "import numpy as np\n"
        "from groonga_ray.search import register_scorer\n"
        "def plugin_register():\n"
        "    register_scorer('const9',\n"
        "        lambda tf, df, df_est, dl, n_docs, avgdl: np.full(len(tf), 9.0))\n"
    )
    assert _get(base, f"/d/register?path={plug}")[1] is True
    env = _get(
        base,
        "/d/select?table=documents&query=query"
        "&match_columns=scorer_const9(text)&output_columns=_id,_score&limit=3",
    )
    rows = env[1][0][2:]
    assert rows and all(r[1] == 9 for r in rows)
    env2 = _get(
        base,
        "/d/select?table=documents&query=query"
        "&match_columns=const9(text)&output_columns=_id,_score&limit=3",
    )
    assert env2[1][0][2:] == rows
    plugin.unregister(str(plug))


def test_server_register_plugin_command(srv, tmp_path):
    server, base = srv
    plug = tmp_path / "srvplug.py"
    plug.write_text(
        "def plugin_register():\n"
        "    pass\n"
        "PING = 'pong'\n"
    )
    env = _get(base, f"/d/register?path={plug}")
    assert env[1] is True
    # loaded into this process
    assert str(plug) in plugin.loaded_plugins()
    server.register_command("ping", lambda p: plugin._loaded[str(plug)].PING)
    env = _get(base, "/d/ping")
    assert env[1] == "pong"
    plugin.unregister(str(plug))
