"""Conformance runner: execute the reference's own command-suite test
scripts (test/command/suite/**.test) against our command surface and
compare semantic values with the paired ``.expected`` files.

Reference harness: grntest-style scripts — each line is a command in
the reference's command-line form (``cmd --name value positional``,
lib/ctx.c:1529 ``grn_ctx_send`` command-line branch; positional args
bind to the command's declared vars in order, lib/proc.c DEF_COMMAND
tables), with ``load`` followed by a multi-line JSON values block.
The ``.expected`` file interleaves the echoed script with one JSON
envelope per command.

Comparison is value-level: envelope heads (rc/time), column *type*
names and column display names are ignored — row values, hit counts,
normalized strings, types/checks arrays must match exactly. This keeps
the check honest about semantics while tolerating representation
differences (our Arrow type names vs groonga's, Int32 score encoding).
"""

from __future__ import annotations

import json
import re

# positional parameter order per command (lib/proc.c:6749-7020 DEF_VAR
# tables; select at 6759-6781, load 6785, normalize 6886, tokenize 6891)
VAR_ORDERS: dict[str, list[str]] = {
    "select": [
        "table", "match_columns", "query", "filter", "scorer", "sortby",
        "output_columns", "offset", "limit", "drilldown", "drilldown_sortby",
        "drilldown_output_columns", "drilldown_offset", "drilldown_limit",
        "cache", "match_escalation_threshold", "query_expansion",
        "query_flags", "query_expander", "adjuster", "drilldown_calc_types",
        "drilldown_calc_target",
    ],
    "define_selector": ["name"],  # + select's vars
    "load": ["values", "table", "columns", "ifexists", "input_type", "each"],
    "table_create": [
        "name", "flags", "key_type", "value_type", "default_tokenizer",
        "normalizer", "token_filters",
    ],
    "table_remove": ["name"],
    "table_rename": ["name", "new_name"],
    "column_create": ["table", "name", "flags", "type", "source"],
    "column_remove": ["table", "name"],
    "column_list": ["table"],
    "normalize": ["normalizer", "string", "flags"],
    "tokenize": ["tokenizer", "string", "normalizer", "flags", "mode", "token_filters"],
    "table_tokenize": ["table", "string", "flags", "mode"],
    "delete": ["table", "key", "id", "filter"],
    "cache_limit": ["max"],
    "truncate": ["target_name", "table"],
    "range_filter": [
        "table", "column", "min", "min_border", "max", "max_border",
        "offset", "limit", "filter", "output_columns",
    ],
    "column_rename": ["table", "name", "new_name"],
    "suggest": [
        "types", "table", "column", "query", "sortby", "output_columns",
        "offset", "limit", "frequency_threshold",
        "conditional_probability_threshold", "prefix_search",
        "similar_search",
    ],
    "log_level": ["level"],
    "log_put": ["level", "message"],
    "defrag": ["target_name", "threshold"],
    "clearlock": ["target_name"],
    "lock_clear": ["target_name"],
    "register": ["path"],
    "ruby_eval": ["script"],
    "ruby_load": ["path"],
    "plugin_register": ["name"],
    "plugin_unregister": ["name"],
    "request_cancel": ["id"],
    "logical_count": [
        "logical_table", "shard_key", "min", "min_border", "max",
        "max_border", "filter",
    ],
    "logical_range_filter": [
        "logical_table", "shard_key", "min", "min_border", "max",
        "max_border", "order", "filter", "offset", "limit",
        "output_columns",
    ],
    "status": [], "table_list": [], "tokenizer_list": [],
    "normalizer_list": [], "quit": [], "shutdown": [], "log_reopen": [],
    "dump": ["tables"],
}
VAR_ORDERS["define_selector"] = ["name"] + VAR_ORDERS["select"]


def split_command_line(line: str) -> list[str]:
    """Tokenize a command line the way grn_ctx_send's command-line
    branch does: whitespace-separated, with '...'/"..." quoting and
    backslash escapes (\\n etc. inside quotes)."""
    toks: list[str] = []
    cur: list[str] = []
    quote: str | None = None
    i, n = 0, len(line)
    started = False
    while i < n:
        c = line[i]
        if quote:
            if c == "\\" and i + 1 < n:
                nxt = line[i + 1]
                cur.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                i += 2
                continue
            if c == quote:
                quote = None
            else:
                cur.append(c)
            i += 1
            continue
        if c in "'\"":
            quote = c
            started = True
            i += 1
            continue
        if c.isspace():
            if cur or started:
                toks.append("".join(cur))
                cur, started = [], False
            i += 1
            continue
        if c == "\\" and i + 1 < n:
            cur.append(line[i + 1])
            i += 2
            continue
        cur.append(c)
        i += 1
    if cur or started:
        toks.append("".join(cur))
    return toks


def parse_command(line: str) -> tuple[str, dict]:
    """Command line → (name, params) with positionals bound in the
    command's declared var order (grn_expr parse_command + DEF_VAR)."""
    if line.lstrip().startswith("/d/"):
        # HTTP-path form: /d/<command>[.<output_type>]?k=v&... (grntest
        # feeds these through the httpd; src/groonga.c grn_document_root
        # path dispatch). Values are URL-decoded.
        from urllib.parse import parse_qsl, urlsplit

        u = urlsplit(line.strip())
        name = u.path[len("/d/"):]
        params: dict[str, str] = {}
        if "." in name:
            name, ext = name.rsplit(".", 1)
            params["output_type"] = ext
        params.update(parse_qsl(u.query, keep_blank_values=True))
        return name, params
    toks = split_command_line(line)
    if not toks:
        raise ValueError("empty command")
    name, toks = toks[0], toks[1:]
    order = VAR_ORDERS.get(name, [])
    params: dict[str, str] = {}
    pos = 0
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.startswith("--"):
            key = t[2:]
            val = toks[i + 1] if i + 1 < len(toks) else ""
            params[key] = val
            i += 2
        else:
            if pos < len(order):
                params[order[pos]] = t
            pos += 1
            i += 1
    return name, params


def parse_script(
    text: str, include_dir: str | None = None, _included: bool = False
) -> list[tuple[str, dict, bool]]:
    """A .test script → [(command, params, from_include)]. Handles
    comment lines (#...), blank lines, trailing-backslash
    continuations, load's following JSON values block
    (balanced-bracket scan), and — when ``include_dir`` is given —
    grntest's ``#@include <path>`` directive (paths resolve against
    ``include_dir``, the reference's ``test/command`` root; included
    fixture commands execute but produce no envelopes in the
    ``.expected`` file, hence the ``from_include`` flag)."""
    lines = text.splitlines()
    out: list[tuple[str, dict, bool]] = []
    i = 0
    logging_off = False  # inside #@disable-logging .. #@enable-logging
    while i < len(lines):
        line = lines[i].rstrip("\n")
        i += 1
        if not line.strip() or line.lstrip().startswith("#"):
            stripped = line.strip()
            # grntest logging directives: commands while logging is
            # disabled execute but emit nothing into .expected — same
            # treatment as #@include fixtures (run, don't compare)
            if stripped.startswith("#@disable-logging"):
                logging_off = True
                continue
            if stripped.startswith("#@enable-logging"):
                logging_off = False
                continue
            if stripped.startswith("#@copy-path") and include_dir is not None:
                import os as _os

                src, dst = stripped[len("#@copy-path"):].split()
                out.append((
                    "copy_path",
                    {"src_abs": _os.path.join(include_dir, src), "dst": dst},
                    True,
                ))
                continue
            if stripped.startswith("#@suggest-create-dataset"):
                # grntest runs groonga-suggest-create-dataset: emit the
                # dataset-DDL pseudo command (runs, never compared)
                ds = stripped[len("#@suggest-create-dataset"):].strip()
                out.append(("suggest_create_dataset", {"name": ds}, True))
                continue
            if stripped.startswith("#@include") and include_dir is not None:
                import os

                rel = stripped[len("#@include"):].strip()
                with open(os.path.join(include_dir, rel)) as fh:
                    out.extend(
                        parse_script(fh.read(), include_dir, _included=True)
                    )
            continue
        while line.rstrip().endswith("\\"):
            line = line.rstrip()[:-1] + " " + (lines[i] if i < len(lines) else "")
            i += 1
        name, params = parse_command(line)
        if name == "load" and "values" not in params:
            block, depth, started = [], 0, False
            while i < len(lines):
                vline = lines[i]
                i += 1
                block.append(vline)
                for ch in vline:
                    if ch in "[{":
                        depth += 1
                        started = True
                    elif ch in "]}":
                        depth -= 1
                if started and depth == 0:
                    break
            params["values"] = "\n".join(block)
        out.append((name, params, _included or logging_off))
    return out


def parse_expected(text: str) -> list:
    """A .expected file → the list of response envelopes, in command
    order. Envelopes are the top-level JSON values whose first element
    is the ``[rc, start, elapsed]`` head — the echoed load-values
    blocks don't match that shape and are skipped."""
    envs = []
    dec = json.JSONDecoder()
    i, n = 0, len(text)
    while i < n:
        # candidates start at a line beginning with [ (after stripping)
        j = text.find("\n", i)
        line_start = i
        line = text[i:j if j != -1 else n]
        i = (j + 1) if j != -1 else n
        if line.lstrip().startswith("<?xml"):
            # --output_type xml response. select renders inside
            # <SEGMENTS>; every other command inside <RESULT ...>
            # (lib/output.c xml branch).
            if text[i:].lstrip().startswith("<RESULT"):
                kind, end_tag = "xmlcmd", "</RESULT>"
            else:
                kind, end_tag = "xml", "</SEGMENTS>"
            e = text.find(end_tag, line_start)
            if e != -1:
                envs.append((kind, text[line_start:e + len(end_tag)]))
                i = e + len(end_tag)
                nl = text.find("\n", i)
                i = (nl + 1) if nl != -1 else n
            continue
        m_cb = re.match(r"\s*([A-Za-z_$][\w$]*)\(", line)
        if m_cb and not line.lstrip().startswith("["):
            # JSONP response: callback(<envelope>); (output_type json +
            # callback=..., lib/output.c grn_output_envelope jsonp)
            start = line_start + m_cb.end()
            try:
                val, end = dec.raw_decode(text[start:])
            except json.JSONDecodeError:
                continue
            if (
                isinstance(val, list) and val
                and isinstance(val[0], list) and len(val[0]) in (3, 4)
                and all(isinstance(x, (int, float)) for x in val[0][:3])
            ):
                envs.append(("jsonp", m_cb.group(1), val))
                consumed = start + end
                nl = text.find("\n", consumed)
                i = (nl + 1) if nl != -1 else n
            continue
        if not line.lstrip().startswith("["):
            continue
        start = line_start + (len(line) - len(line.lstrip()))
        try:
            val, end = dec.raw_decode(text[start:])
        except json.JSONDecodeError:
            continue
        if (
            isinstance(val, list) and val
            and isinstance(val[0], list) and val[0]
            and isinstance(val[0][0], list) and len(val[0][0]) in (3, 4)
            and all(isinstance(x, (int, float)) for x in val[0][0][:3])
        ):
            # grntest error envelopes are double-wrapped, possibly with
            # a trailing partial body: [[[-22, t, e], "message"], ""]
            val = val[0]
        if (
            isinstance(val, list) and val
            and isinstance(val[0], list) and len(val[0]) in (3, 4)
            and all(isinstance(x, (int, float)) for x in val[0][:3])
            and isinstance(val[0][1], float) and isinstance(val[0][2], float)
        ):
            envs.append(val)
            # skip past this envelope
            consumed = start + end
            nl = text.find("\n", consumed)
            i = (nl + 1) if nl != -1 else n
    return envs


def render_select_xml(body, offset: int = 0) -> str:
    """A select JSON body → the reference's XML rendering
    (lib/output.c xml branch: RESULTSET/HIT/FIELD; vector values join
    with ", ")."""
    def esc(v) -> str:
        if isinstance(v, dict):
            # weighted vector: "el:weight, el:weight"
            return ", ".join(f"{k}:{w}" for k, w in v.items())
        if isinstance(v, list):
            return ", ".join(esc(x) for x in v)
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and v == int(v):
            return str(int(v))
        s = str(v)
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    out = ['<?xml version="1.0" encoding="utf-8"?>', "<SEGMENTS>",
           "<SEGMENT>", "<RESULTPAGE>"]
    for rs in body:
        if isinstance(rs, dict):
            continue
        nhits = rs[0][0] if rs and rs[0] else 0
        cols = rs[1] if len(rs) > 1 else []
        rows = rs[2:]
        out.append(
            f'<RESULTSET OFFSET="{offset}" LIMIT="{len(rows)}" '
            f'NHITS="{nhits}">'
        )
        for no, row in enumerate(rows, start=1):
            out.append(f'<HIT NO="{no}">')
            for (cname, _ctype), v in zip(cols, row):
                out.append(f'<FIELD NAME="{cname}">{esc(v)}</FIELD>')
            out.append("</HIT>")
        out.append("</RESULTSET>")
    out += ["</RESULTPAGE>", "</SEGMENT>", "</SEGMENTS>"]
    return "\n".join(out)


_XML_CMD_TAGS = {
    "table_list": ("TABLE_LIST", "TABLE"),
    "column_list": ("COLUMN_LIST", "COLUMN"),
}


def render_command_xml(cmd: str, body) -> str:
    """A list-command JSON body ([header, *rows]) → the reference's
    command-XML rendering (lib/output.c: open tags and leaf values are
    newline-prefixed, close tags append to the current line; sources
    arrays render as <SOURCES>, nulls as <NULL/>)."""
    def esc(v) -> str:
        return (
            str(v).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    list_tag, row_tag = _XML_CMD_TAGS[cmd]
    s = (
        '<?xml version="1.0" encoding="utf-8"?>'
        '\n<RESULT CODE="0" UP="0.0" ELAPSED="0.0">'
        f"\n<{list_tag}>"
    )
    header, rows = body[0], body[1:]
    s += "\n<HEADER>"
    for nm, tp in header:
        s += f"\n<PROPERTY>\n<TEXT>{esc(nm)}</TEXT>\n<TEXT>{esc(tp)}</TEXT></PROPERTY>"
    s += "</HEADER>"
    for row in rows:
        s += f"\n<{row_tag}>"
        for v in row:
            if v is None:
                s += "\n<NULL/>"
            elif isinstance(v, bool):
                s += f"\n<TEXT>{'true' if v else 'false'}</TEXT>"
            elif isinstance(v, int):
                s += f"\n<INT>{v}</INT>"
            elif isinstance(v, list):
                s += "\n<SOURCES>"
                for x in v:
                    s += f"\n<TEXT>{esc(x)}</TEXT>"
                s += "</SOURCES>"
            else:
                s += f"\n<TEXT>{esc(v)}</TEXT>"
        s += f"</{row_tag}>"
    s += f"</{list_tag}>\n</RESULT>"
    return s


# ------------------------------------------------------------- comparator

def _shape(cmd: str, body):
    """Reduce a command's body to comparable semantic values."""
    if cmd == "select":
        # list of result sets (and labeled-set dicts)
        shaped = []
        for s in body:
            if isinstance(s, dict):
                shaped.append({k: _shape_set(v) for k, v in sorted(s.items())})
            else:
                shaped.append(_shape_set(s))
        return shaped
    if cmd == "suggest" and isinstance(body, dict):
        # {type: result set} (plugins/suggest command_suggest output)
        return {k: _shape_set(v) for k, v in sorted(body.items())}
    if cmd in ("tokenize", "table_tokenize"):
        return [(t["value"], t.get("position")) for t in body]
    if cmd in ("logical_range_filter", "range_filter") and isinstance(body, list) and body:
        # [[col defs], rows...] — no hit-count head; ignore type names
        return {"rows": [_cell(r) for r in body[1:]]}
    return body


def _shape_set(s):
    # [[nhits], [cols...], rows...] -> {"nhits": n, "rows": [...]}
    nhits = s[0][0] if s and s[0] else 0
    return {"nhits": nhits, "rows": [_cell(r) for r in s[2:]]}


def _cell(v):
    if isinstance(v, float) and v == int(v):
        return int(v)
    if isinstance(v, list):
        return [_cell(x) for x in v]
    return v


def compare(cmd: str, ours, expected_env, ordered: bool = True) -> tuple[bool, str]:
    """Compare our command body against the reference envelope's body.
    Returns (ok, detail). ``ordered=False`` (select with no sort keys)
    compares each result set's rows as a multiset — the reference's
    no-sort output order is result-set hash insertion order, a
    non-semantic artifact."""
    if len(expected_env) < 2:
        return (ours in (None, True), f"expected no body, got {ours!r}")
    exp = expected_env[1]
    a, b = _shape(cmd, ours), _shape(cmd, exp)
    if cmd in ("tokenize", "table_tokenize"):
        # reference token output: [{"value":..,"position":..}]
        b = [(t["value"], t.get("position")) for t in exp]
        a = [(t["value"], t.get("position")) for t in ours]
    if cmd == "select" and not ordered:
        for shaped in (a, b):
            for s in shaped:
                if isinstance(s, dict) and "rows" in s:
                    s["rows"] = sorted(s["rows"], key=json.dumps)
    return (a == b, f"ours={a!r}\nexpected={b!r}")


class ScriptRunner:
    """Run reference .test scripts against a CommandServer's command
    table (direct dispatch — the HTTP layer is tested separately)."""

    def __init__(self, server):
        import os
        import time

        # the reference suite's goldens are produced under
        # TZ=Asia/Tokyo (test/command/run-test.sh:152); Time-text casts
        # use localtime (grn_str2timeval), so pin it for parity
        if os.environ.get("TZ") != "Asia/Tokyo":
            os.environ["TZ"] = "Asia/Tokyo"
            time.tzset()
        self.server = server

    def execute(self, name: str, params: dict):
        fn = self.server._commands.get(name)
        if fn is None:
            raise ValueError(f"unsupported command: {name}")
        # select: the reference's natural order is by _id unless sortby,
        # and its default projection is "_id, _key, *" (proc.c
        # DEFAULT_OUTPUT_COLUMNS; _key only for keyed tables)
        if name == "select":
            params = dict(params)
            if not params.get("sortby") and not params.get("sort_keys"):
                # no-sortby select order is the table cursor's: key
                # order for PAT/DAT lexicons, id order otherwise
                td_p = self.server.pending.get(params.get("table", ""))
                if td_p is not None:
                    flags = td_p.flags or ""
                else:
                    flags = next(
                        (
                            x["flags"] or ""
                            for x in getattr(self.server, "_ddl_tables", [])
                            if x["name"] == params.get("table")
                        ),
                        "",
                    )
                if "PAT_KEY" in flags or "DAT_KEY" in flags:
                    params["sortby"] = "_key"
                else:
                    params["sortby"] = "_id"
            if not params.get("output_columns"):
                cols = "_id,*"
                t = self.server.tables.get(params.get("table", ""))
                if t is not None:
                    import pyarrow.parquet as pq

                    if "_key" in pq.read_schema(t.source_files[0]).names:
                        cols = "_id,_key,*"
                else:
                    td = self.server.pending.get(params.get("table", ""))
                    if td is not None and "NO_KEY" not in (td.flags or ""):
                        cols = "_id,_key,*"
                params["output_columns"] = cols
        params.pop("command_version", None)
        params.pop("output_type", None)
        return fn(params)

    def run_script(self, text: str, include_dir: str | None = None) -> list:
        return [
            (name, params, self.execute(name, params))
            for name, params, _inc in parse_script(text, include_dir)
        ]

    def run_conformance(self, test_path: str, expected_path: str) -> list[dict]:
        """Execute test_path; compare each command's output against
        expected_path. Returns one record per command. ``#@include``
        fixture paths resolve against the enclosing ``test/command``
        directory; included commands run but aren't compared (their
        output is not echoed into ``.expected``)."""
        import os

        include_dir: str | None = None
        d = os.path.dirname(os.path.abspath(test_path))
        while d != "/":
            if os.path.basename(d) == "command" and os.path.isdir(
                os.path.join(d, "fixture")
            ):
                include_dir = d
                break
            d = os.path.dirname(d)
        with open(test_path) as fh:
            script = fh.read()
        if any(
            ln.lstrip().startswith("#@omit") for ln in script.splitlines()
        ):
            # grntest's omit directive: the reference itself skips this
            # script (feature not supported in this version)
            return [{"command": "#@omit", "ok": True, "detail": "omitted"}]
        with open(expected_path) as fh:
            expected = parse_expected(fh.read())
        with open(expected_path) as fh:
            expected_raw = fh.read()
        all_cmds = parse_script(script, include_dir)
        # dump outputs a raw command stream, not a JSON envelope: pair
        # the k-th dump command with the text after the k-th echoed
        # `dump` line (up to the next echoed dump / EOF)
        n_compared = sum(1 for c in all_cmds if not c[2] and c[0] != "dump")
        if len(expected) != n_compared:
            raise ValueError(
                f"{test_path}: {n_compared} commands vs {len(expected)} envelopes"
            )
        exp_lines = expected_raw.splitlines()
        dump_marks = [
            i for i, ln in enumerate(exp_lines)
            if ln == "dump" or ln.startswith("dump ")
        ]
        # the command that FOLLOWS each dump in script order — its echo
        # line terminates the dump body (dump output is itself a
        # command stream, so the next dump mark alone is not enough
        # when other commands sit between two dumps)
        compared = [c for c in all_cmds if not c[2]]
        next_after_dump: list[str | None] = []
        for idx, c in enumerate(compared):
            if c[0] == "dump":
                nxt = compared[idx + 1][0] if idx + 1 < len(compared) else None
                next_after_dump.append(nxt)
        dump_expected: list[str] = []
        for k, mi in enumerate(dump_marks):
            end = dump_marks[k + 1] if k + 1 < len(dump_marks) else len(exp_lines)
            nxt = next_after_dump[k] if k < len(next_after_dump) else None
            if nxt and nxt != "dump":
                for i in range(mi + 1, end):
                    ln = exp_lines[i]
                    if ln == nxt or ln.startswith(nxt + " "):
                        # echo of the next command: confirmed if an
                        # envelope ("[...") follows it
                        j = i + 1
                        while j < end and not exp_lines[j].strip():
                            j += 1
                        if j < end and exp_lines[j].lstrip().startswith("["):
                            end = i
                            break
            dump_expected.append("\n".join(exp_lines[mi + 1:end]).strip("\n"))
        dump_i = 0
        out = []
        env_iter = iter(expected)
        for name, params, inc in all_cmds:
            if inc:
                # fixture setup: run in order, don't compare. Errors are
                # tolerated — fixtures deliberately include failing DDL
                # (e.g. sharding/logical_range_filter/index/schema.grn's
                # misspelled TokenizerBigram) whose failure shapes the
                # schema the test then exercises.
                try:
                    self.execute(name, params)
                except Exception:  # noqa: BLE001 - fixture errors expected
                    pass
                continue
            if name == "dump":
                exp_text = (
                    dump_expected[dump_i] if dump_i < len(dump_expected) else ""
                )
                dump_i += 1
                try:
                    body = self.execute(name, params)
                except Exception as e:  # noqa: BLE001
                    out.append(
                        {"command": name, "ok": False,
                         "detail": f"{type(e).__name__}: {e}"}
                    )
                    continue
                got = (body or "").strip("\n")
                ok = got == exp_text
                out.append(
                    {
                        "command": name,
                        "ok": ok,
                        "detail": "ok" if ok else f"ours:\n{got}\nexpected:\n{exp_text}",
                    }
                )
                continue
            env = next(env_iter)
            err = None
            ordered = bool(params.get("sortby") or params.get("sort_keys"))
            try:
                body = self.execute(name, params)
            except Exception as e:  # noqa: BLE001 - reported as mismatch
                body, err = None, f"{type(e).__name__}: {e}"
            jsonp_cb = None
            if isinstance(env, tuple) and env and env[0] == "jsonp":
                jsonp_cb, env = env[1], env[2]
            if isinstance(env, tuple) and env and env[0] == "xmlcmd":
                if err is not None:
                    out.append({"command": name, "ok": False, "detail": err})
                    continue
                got = render_command_xml(name, body).strip()
                exp_txt = env[1].strip()
                ok = got == exp_txt
                out.append(
                    {
                        "command": name,
                        "ok": ok,
                        "detail": "ok" if ok
                        else f"ours:\n{got}\nexpected:\n{exp_txt}",
                    }
                )
                continue
            if isinstance(env, tuple) and env and env[0] == "xml":
                if err is not None:
                    out.append({"command": name, "ok": False, "detail": err})
                    continue
                got = render_select_xml(
                    body, offset=int(params.get("offset") or 0)
                ).strip()
                exp_txt = env[1].strip()
                ok = got == exp_txt
                out.append(
                    {
                        "command": name,
                        "ok": ok,
                        "detail": "ok" if ok
                        else f"ours:\n{got}\nexpected:\n{exp_txt}",
                    }
                )
                continue
            expected_err = bool(env and env[0] and env[0][0] != 0)
            if err is None and not expected_err:
                ok, detail = compare(name, body, env, ordered=ordered)
            elif err is not None and expected_err:
                ok, detail = True, "error == expected error"  # both errored
            elif err is not None:
                ok, detail = False, err
            else:
                ok, detail = False, f"we succeeded, reference errored: {env[0]!r}"
            if ok and jsonp_cb is not None and params.get("callback") != jsonp_cb:
                ok = False
                detail = (
                    f"jsonp callback {params.get('callback')!r} != {jsonp_cb!r}"
                )
            out.append({"command": name, "ok": ok, "detail": detail})
        return out
