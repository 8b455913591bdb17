"""XML config ingestion: reference-style ``settings.xml`` → path specs.

Parity target: the reference is configured entirely through XML — a
*path* is an ordered chain of forwards declared as child elements
(`src/io/forward/PathForward.java:115-263`), each with its own element
grammar: filter (`src/io/forward/FilterForward.java:167-208`), math
(`src/io/forward/MathForward.java:98-165`), editor
(`src/io/forward/EditorForward.java:157-287`), generic
(`src/worker/Generic.java:373-416`). This module parses that grammar
with stdlib ElementTree and emits the plain-dict ``PathSpec`` that
:mod:`dcafs_spark.plans.dsl` compiles to a DataFrame plan — so an
existing deployment's ``settings.xml`` paths port verbatim.

Only config parsing happens here; no Spark imports, no I/O beyond the
file read. ``{0x3C}``/``{0x3E}`` escapes (XMLtools.replaceSpecialXML,
`src/util/xml/XMLtools.java:344-349`) are honored in text content.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Any

PathSpec = dict[str, Any]

_GENERIC_DTYPES = {
    "real": "real",
    "double": "real",
    "integer": "integer",
    "int": "integer",
    "flag": "flag",
    "bool": "flag",
    "text": "text",
    "timestamp": "text",
}


def _text(el: ET.Element) -> str:
    """Element text content with the reference's special escapes."""
    t = "".join(el.itertext())
    return t.replace("{0x3C}", "<").replace("{0x3E}", ">")


def _bool_attr(el: ET.Element, name: str, default: bool = False) -> bool:
    v = el.get(name)
    return default if v is None else v.strip().lower() in ("true", "yes", "1")


def _filter_step(el: ET.Element, delimiter: str) -> dict:
    """<filter> → filter step (FilterForward.java:167-208).

    Rules come from <rule type=..>value</rule> children (directly or
    under a <rules> wrapper); multiple 'start' rules OR-combine into
    one multi-option start rule (addStartOptions, :324-328). A filter
    with no rule children uses its own type attribute + text content.
    """
    rule_els = el.findall("rule") + el.findall("rules/rule")
    rules: list[list[str]] = []
    starts: list[str] = []
    for r in rule_els:
        rtype = (r.get("type") or "").strip().lower()
        if rtype == "start":
            starts.append(_text(r))
        else:
            rules.append([rtype, _text(r)])
    if starts:
        rules.insert(0, ["start", ",".join(starts)])
    if not rule_els and el.get("type"):
        rules.append([el.get("type").strip().lower(), _text(el)])
    step: dict = {"type": "filter", "rules": rules}
    if el.get("delimiter") is not None:
        step["delimiter"] = el.get("delimiter")
    if _bool_attr(el, "negate"):
        step["negate"] = True
    if el.get("ignores") is not None:
        step["ignores"] = int(el.get("ignores"))
    if el.get("reject") is not None:  # extension: named reject route
        step["reject"] = el.get("reject")
    return step


_MATH_SPECIALS = {"salinity", "svc", "truewindspeed", "truewinddir"}


def _math_op(el: ET.Element) -> dict:
    """<op> → MathOp dict (MathForward.java:140-158)."""
    optype = (el.get("type") or "complex").strip().lower()
    content = _text(el).strip()
    scale = el.get("scale")
    op: dict = {}
    if optype == "complex":
        if "=" in content:
            target, formula = content.split("=", 1)
        elif el.get("index") is not None:
            # das-grammar shape: <op index="2">formula</op> writes iN
            # (manual 'Basic usage example'; MathForward.java:140-158)
            target, formula = f"i{el.get('index')}", content
        else:  # bare expression updates i0, like addStdOperation's default
            target, formula = "i0", content
        op = {"target": target.strip(), "formula": formula.strip()}
    elif optype in _MATH_SPECIALS:
        index = el.get("index", "-1")
        op = {"target": f"i{index}", "formula": content, "special": optype}
    else:
        raise ValueError(f"unsupported math op type: {optype!r}")
    if scale is not None and int(scale) >= 0:
        op["scale"] = int(scale)
    return op


def _math_step(el: ET.Element, delimiter: str) -> dict:
    consts = {d.get("ref"): float(_text(d)) for d in el.findall("def")}
    op_els = el.findall("op")
    if op_els:
        ops = [_math_op(o) for o in op_els]
    else:  # single op as the element's own content
        ops = [_math_op(el)]
    step: dict = {"type": "math", "ops": ops}
    if consts:
        step["consts"] = consts
    if el.get("delimiter") is not None:
        step["delimiter"] = el.get("delimiter")
    if el.get("suffix") is not None:  # suffix="nmea" (MathForward.java:279-286)
        step["suffix"] = el.get("suffix")
    return step


def _edit_args(edit: ET.Element, default_delim: str) -> tuple[str, dict]:
    """One <edit type=..> → (kind, args) for operators.editor_forward.

    Attribute/content mapping follows the reference examples
    (EditorForward.java:51-96) and dispatch (:191-287)."""
    kind = (edit.get("type") or "").strip().lower()
    content = _text(edit)
    delim = edit.get("delimiter")
    a: dict = {}
    if kind == "resplit":
        a = {"template": content, "leftover": edit.get("leftover", "append")}
    elif kind == "charsplit":
        a = {"positions": [int(x) for x in content.replace(" ", "").split(",") if x]}
    elif kind in ("rexsplit", "rexkeep"):
        a = {"regex": content.strip()}
    elif kind in ("redate", "retime"):
        a = {"from": edit.get("from", ","), "to": content.strip()}
        if edit.get("index") is not None:
            a["index"] = int(edit.get("index"))
    elif kind == "millisdate":
        a = {"to": content.strip() or "sql"}
        if edit.get("index") is not None:
            a["index"] = int(edit.get("index"))
    elif kind == "replace":
        a = {"find": edit.get("find", ""), "replacement": content}
    elif kind == "rexreplace":
        a = {"regex": edit.get("find", ""), "replacement": content}
    elif kind == "remove":
        a = {"find": content}
    elif kind == "rexremove":
        a = {"regex": content.strip()}
    elif kind == "trim":
        a = {}
    elif kind in ("prepend", "prefix"):
        kind = "prepend"
        a = {"text": content}
    elif kind in ("append", "suffix"):
        kind = "append"
        a = {"text": content}
    elif kind == "insert":
        a = {"position": int(edit.get("position", "0")), "text": content}
    elif kind in ("cutstart", "cutend"):
        a = {"count": int(content.strip())}
    elif kind == "toascii":
        a = {}
    elif kind == "listreplace":
        a = {
            "first": int(edit.get("first", "0")),
            "list": [x for x in content.split(",")],
        }
    else:
        raise ValueError(f"unknown edit type: {kind!r}")
    if delim is not None:
        a["delimiter"] = delim
    return kind, a


def _editor_step(el: ET.Element, delimiter: str) -> dict:
    edit_els = el.findall("edit")
    if edit_els:
        edits = [
            {"kind": k, "args": a}
            for k, a in (_edit_args(e, delimiter) for e in edit_els)
        ]
    else:  # single edit declared on the editor element itself (:164-169)
        k, a = _edit_args(el, delimiter)
        edits = [{"kind": k, "args": a}]
    step: dict = {"type": "editor", "edits": edits}
    if el.get("delimiter") is not None:
        step["delimiter"] = el.get("delimiter")
    return step


def _generic_step(el: ET.Element, delimiter: str) -> dict:
    """<generic>/<store> → generic step (Generic.java:373-416)."""
    fields = []
    idx_auto = 0
    for ent in el:
        tag = ent.tag.lower()
        if tag in ("macro", "filler", "tag", "localdt", "utcdt"):
            continue  # fillers/macros are sink-side concepts; see projection.Generic.fillers
        if tag not in _GENERIC_DTYPES:
            continue
        index = ent.get("index", ent.get("i"))
        index = int(index) if index is not None else idx_auto
        idx_auto = index + 1
        f: dict = {"name": _text(ent).strip(), "index": index, "dtype": _GENERIC_DTYPES[tag]}
        if ent.get("def"):
            raw = ent.get("def")
            if _GENERIC_DTYPES[tag] == "real":
                f["default"] = float(raw)
            elif _GENERIC_DTYPES[tag] == "integer":
                f["default"] = int(raw)
            else:
                f["default"] = raw
        fields.append(f)
    step: dict = {"type": "generic", "fields": fields}
    if el.get("delimiter") is not None:
        step["delimiter"] = el.get("delimiter")
    if el.get("startswith"):
        step["startswith"] = el.get("startswith")
    if _bool_attr(el, "nrs"):
        step["nrs"] = True
    if el.get("keep"):
        step["keep"] = [c.strip() for c in el.get("keep").split(",")]
    return step


def _valmap_step(el: ET.Element, delimiter: str) -> dict:
    step: dict = {"type": "valmap", "split": el.get("split", ":")}
    if el.get("multi"):
        step["multi"] = el.get("multi")
    return step


_STEP_BUILDERS = {
    "filter": _filter_step,
    "math": _math_step,
    "editor": _editor_step,
    "generic": _generic_step,
    "store": _generic_step,
    "valmap": _valmap_step,
}


def path_spec_from_element(el: ET.Element) -> PathSpec:
    """One <path> element → PathSpec dict for dsl.compile_path."""
    delimiter = el.get("delimiter", ",")
    spec: PathSpec = {
        "id": el.get("id", ""),
        "delimiter": delimiter,
        "steps": [],
    }
    if el.get("src"):
        spec["src"] = el.get("src")
    for child in el:
        tag = child.tag.lower()
        if tag == "customsrc":
            # interval custom source (PathForward.java:127-133): the
            # engine turns this into a ticking spool the path streams
            spec["customsrc"] = {
                "type": child.get("type", "plain"),
                "interval": child.get("interval", "1s"),
                "data": (child.text or "").strip(),
            }
            continue
        if tag == "cmd":  # runtime wiring, not a plan step
            continue
        builder = _STEP_BUILDERS.get(tag)
        if builder is None:
            raise ValueError(f"unknown path step element: <{child.tag}>")
        spec["steps"].append(builder(child, delimiter))
    return spec


def load_paths(source: str | Path) -> dict[str, PathSpec]:
    """Parse a settings.xml (string or file path) into {path_id: spec}.

    Accepts a full ``<dcafs>`` document (paths under ``<paths>`` or at
    the root — both layouts appear in reference configs), a bare
    ``<paths>`` list, or a single ``<path>`` element."""
    text: str
    if isinstance(source, Path) or (
        isinstance(source, str) and not source.lstrip().startswith("<")
    ):
        text = Path(source).read_text()
    else:
        text = source
    root = ET.fromstring(text)
    if root.tag == "path":
        spec = path_spec_from_element(root)
        return {spec["id"]: spec}
    out: dict[str, PathSpec] = {}
    for el in root.iter("path"):
        spec = path_spec_from_element(el)
        out[spec["id"]] = spec
    return out


# ------------------------------------------------- legacy das-level grammar


def _parse_xml(source: str | Path) -> ET.Element:
    if isinstance(source, Path) or (
        isinstance(source, str) and not source.lstrip().startswith("<")
    ):
        return ET.fromstring(Path(source).read_text())
    return ET.fromstring(source)


def load_das_sections(source: str | Path) -> dict:
    """Legacy das-level sectioned settings.xml (manual 'Basic usage
    example', docs/DAS Core manual.md:2340-2392; the pre-<path> layout
    older deployments still run): top-level <filters>/<editors>/
    <maths>/<generics> sections whose forwards chain by reference —
    ``src="filter:zda"`` consumes another forward's output,
    ``label="generic:zda"`` routes into a generic. Each generic
    terminates one PathSpec; the chain is walked backwards to the raw
    stream src. Also returns <streams> specs and <settings><databases>
    sqlite defs so the caller can register sources/sinks.

    Returns {"paths": {id: PathSpec}, "streams": {...}, "databases": {...}}.
    """
    root = _parse_xml(source)
    kinds = {"filters": "filter", "editors": "editor", "maths": "math"}
    nodes: dict[tuple[str, str], dict] = {}
    for section, kind in kinds.items():
        for el in root.iter(section):
            for child in el.findall(kind):
                fid = child.get("id", "")
                step = _STEP_BUILDERS[kind](child, child.get("delimiter", ","))
                nodes[(kind, fid)] = {
                    "step": step,
                    "src": child.get("src", ""),
                    "label": child.get("label", ""),
                }
    generics: dict[str, dict] = {}
    for el in root.iter("generics"):
        for child in el.findall("generic"):
            gid = child.get("id", "")
            generics[gid] = {
                "step": _generic_step(child, child.get("delimiter", ",")),
                "dbid": child.get("dbid"),
                "table": child.get("table"),
            }
    paths: dict[str, PathSpec] = {}
    for gid, g in generics.items():
        # find the forward labeled generic:<gid>; a generic may also be
        # fed straight from a filter (label on any forward kind)
        feeder_key = next(
            (k for k, n in nodes.items() if n["label"] == f"generic:{gid}"), None
        )
        chain: list[dict] = []
        src = ""
        key = feeder_key
        seen: set[tuple[str, str]] = set()
        while key is not None and key not in seen:
            seen.add(key)
            node = nodes[key]
            chain.insert(0, node["step"])
            ref = node["src"]
            if ":" in ref and ref.split(":", 1)[0] in ("filter", "editor", "math"):
                k, _, rid = ref.partition(":")
                key = (k, rid)
            else:
                src = ref  # raw:id:<stream> or any engine source ref
                key = None
        steps = chain + [g["step"]]
        spec: PathSpec = {"id": gid, "delimiter": ",", "steps": steps}
        if src:
            spec["src"] = src
        if g["dbid"]:
            spec["db"] = {"dbid": g["dbid"], "table": g["table"]}
        paths[gid] = spec

    streams: dict[str, dict] = {}
    for el in root.iter("streams"):
        for st in el.findall("stream"):
            sid = st.get("id", "")
            addr = (st.findtext("address") or "").strip()
            streams[sid] = {
                "kind": st.get("type", "tcp"),
                "address": addr,
                "eol": (st.findtext("eol") or "crlf").strip(),
            }

    databases: dict[str, dict] = {}
    for el in root.iter("databases"):
        for db in el.findall("sqlite"):
            did = db.get("id", "")
            tables: dict[str, list[tuple[str, str]]] = {}
            for tb in db.findall("table"):
                cols = []
                for ent in tb:
                    if ent.tag.lower() in _GENERIC_DTYPES:
                        cols.append((_text(ent).strip(), _GENERIC_DTYPES[ent.tag.lower()]))
                tables[tb.get("name", "")] = cols
            databases[did] = {"path": db.get("path", ""), "tables": tables}
    return {"paths": paths, "streams": streams, "databases": databases}


def load_rtvals(source: str | Path) -> list[dict]:
    """<rtvals> settings grammar (RealtimeValues.readFromXML,
    src/util/data/RealtimeValues.java:61-130): <group id=..> children
    real/double/integer/int/flag/text, each with name/id attr (or text
    content), unit, scale, default/def, comma-separated options
    (minmax/time/scale:N/order:N/history:N/abs) and <cmd when=..>
    triggered commands (RealVal.java:78-103).

    Returns a list of val specs:
    {group, name, vtype, unit, scale, default, options, cmds}.
    """
    root = _parse_xml(source)
    _VTYPES = {
        "real": "real", "double": "real",
        "integer": "integer", "int": "integer",
        "flag": "flag", "text": "text",
    }
    out: list[dict] = []
    for rt in root.iter("rtvals"):
        def_real = rt.get("realdefault")
        for grp in rt.findall("group"):
            gid = grp.get("id", grp.get("name", ""))
            for el in grp:
                vtype = _VTYPES.get(el.tag.lower())
                if vtype is None:
                    continue
                name = el.get("name", el.get("id", "")) or _text(el).strip()
                spec: dict = {
                    "group": gid,
                    "name": name,
                    "vtype": vtype,
                    "unit": el.get("unit", ""),
                    "scale": int(el.get("scale", "-1")),
                    "default": el.get("default", el.get("def", def_real)),
                    "options": {},
                    "cmds": [],
                }
                for opt in (el.get("options") or "").split(","):
                    if not opt:
                        continue
                    k, _, v = opt.partition(":")
                    spec["options"][k.strip()] = v if v else True
                for cmd in el.findall("cmd"):
                    spec["cmds"].append((cmd.get("when", "always"), _text(cmd).strip()))
                out.append(spec)
    return out
