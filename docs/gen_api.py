"""Generate the config-reference section of docs/API.md from config.py.

The config surface is the framework's real API (SURVEY.md section 5.6: the
reference's flag soup becomes one typed dataclass tree), so the reference
doc is *generated from* the dataclasses rather than maintained by hand:
every field's name, type, default and the commentary written next to it in
``config.py`` are extracted via ast + source comments and rendered between
the BEGIN/END markers in docs/API.md. ``tests/test_api_doc.py`` fails when
the committed doc drifts from the dataclasses.

Usage:
    python docs/gen_api.py            # rewrite docs/API.md in place
    python docs/gen_api.py --check    # exit 1 if docs/API.md is stale
"""

from __future__ import annotations

import ast
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
CONFIG_PATH = os.path.join(_REPO, "collaborative_gan_sampling_tpu",
                           "config.py")
API_PATH = os.path.join(_HERE, "API.md")

BEGIN = "<!-- BEGIN CONFIG REFERENCE (generated: python docs/gen_api.py) -->"
END = "<!-- END CONFIG REFERENCE -->"

# Render order: the Config tree root first, then leaves in tree order.
_CLASS_ORDER = ["Config", "ModelConfig", "DataConfig", "TrainConfig",
                "RefineConfig", "EvalConfig", "MeshConfig"]
# Field prefix in dotted-override notation per class.
_PREFIX = {"Config": "", "ModelConfig": "model.", "DataConfig": "data.",
           "TrainConfig": "train.", "RefineConfig": "refine.",
           "EvalConfig": "eval.", "MeshConfig": "mesh."}


def _is_dataclass(node: ast.ClassDef) -> bool:
    for dec in node.decorator_list:
        target = dec.func if isinstance(dec, ast.Call) else dec
        if getattr(target, "id", getattr(target, "attr", "")) == "dataclass":
            return True
    return False


def _clean_comment(lines: list[str]) -> str:
    text = " ".join(l.lstrip("#").strip() for l in lines)
    return re.sub(r"\s+", " ", text).strip()


def _collect_fields(src: str) -> dict[str, list[dict]]:
    """{class name: [{name, type, default, doc}]} for every dataclass.

    A field's doc is (a) the trailing ``#`` comment on its own (last) line
    plus any immediately following whole-line comments (the continuation
    style config.py uses), or (b) when there is no trailing comment, the
    whole-line comments immediately *preceding* the field (leading style,
    e.g. compute_dtype). A comment block can only serve one field.
    """
    tree = ast.parse(src)
    lines = src.splitlines()
    out: dict[str, list[dict]] = {}
    for node in tree.body:
        if not (isinstance(node, ast.ClassDef) and _is_dataclass(node)):
            continue
        stmts = [s for s in node.body if isinstance(s, ast.AnnAssign)
                 and isinstance(s.target, ast.Name)]
        fields = []
        consumed_through = 0  # 0-based line index already used as doc
        for s in stmts:
            doc_lines: list[str] = []
            last = lines[s.end_lineno - 1]
            if "#" in last:
                # Trailing comment + following whole-line continuations.
                doc_lines.append(last[last.index("#"):])
                i = s.end_lineno  # 0-based index of the line AFTER the stmt
                while i < len(lines) and lines[i].strip().startswith("#"):
                    doc_lines.append(lines[i].strip())
                    i += 1
                consumed_through = i
            else:
                # Leading whole-line comments (not already a continuation
                # of the previous field's trailing comment).
                i = s.lineno - 2
                lead: list[str] = []
                while (i >= consumed_through
                       and lines[i].strip().startswith("#")):
                    lead.insert(0, lines[i].strip())
                    i -= 1
                doc_lines = lead
                consumed_through = s.end_lineno
            default = (ast.get_source_segment(src, s.value)
                       if s.value is not None else "")
            if default.startswith("field(default_factory="):
                default = default[len("field(default_factory="):-1] + "()"
            fields.append({
                "name": s.target.id,
                "type": ast.get_source_segment(src, s.annotation),
                "default": default,
                "doc": _clean_comment(doc_lines),
            })
        out[node.name] = fields
    return out


def render() -> str:
    """The generated markdown block (markers included)."""
    with open(CONFIG_PATH) as fh:
        src = fh.read()
    classes = _collect_fields(src)
    missing = [c for c in classes if c not in _CLASS_ORDER]
    if missing:
        raise SystemExit(
            f"docs/gen_api.py: new dataclass(es) {missing} in config.py — "
            "add them to _CLASS_ORDER/_PREFIX so they are documented")
    out = [BEGIN, "", "## Configuration reference", "",
           "Every field, generated from `config.py`'s dataclasses "
           "(`python docs/gen_api.py`; CI diffs this section against the "
           "source — see `tests/test_api_doc.py`). Each entry is a dotted "
           "CLI override: `refine.steps=50`.", ""]
    for cname in _CLASS_ORDER:
        if cname not in classes:
            continue
        prefix = _PREFIX[cname]
        title = prefix.rstrip(".") if prefix else "top level"
        out.append(f"### `{cname}` ({title})")
        out.append("")
        for f in classes[cname]:
            if prefix == "" and f["type"] in (
                    "ModelConfig", "DataConfig", "TrainConfig",
                    "RefineConfig", "EvalConfig", "MeshConfig"):
                doc = f"see `{f['type']}` below"
                out.append(f"- **`{f['name']}`** (`{f['type']}`) — {doc}")
                continue
            head = (f"- **`{prefix}{f['name']}`** (`{f['type']}`, "
                    f"default `{f['default']}`)")
            out.append(head + (f" — {f['doc']}" if f["doc"] else ""))
        out.append("")
    out.append(END)
    return "\n".join(out) + "\n"


def inject(api_text: str, block: str) -> str:
    """Replace (or append) the marker-delimited section in API.md text."""
    if BEGIN in api_text and END in api_text:
        pre = api_text[:api_text.index(BEGIN)]
        post = api_text[api_text.index(END) + len(END):].lstrip("\n")
        return pre + block + (("\n" + post) if post else "")
    return api_text.rstrip("\n") + "\n\n" + block


def main(argv: list[str]) -> int:
    block = render()
    with open(API_PATH) as fh:
        current = fh.read()
    updated = inject(current, block)
    if "--check" in argv:
        if updated != current:
            print("docs/API.md config reference is stale — "
                  "run: python docs/gen_api.py", file=sys.stderr)
            return 1
        return 0
    if updated != current:
        with open(API_PATH, "w") as fh:
            fh.write(updated)
        print(f"updated {API_PATH}")
    else:
        print(f"{API_PATH} already current")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
