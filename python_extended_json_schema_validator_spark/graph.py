"""Constraint-graph export (SURVEY.md §2.1 S10 — the reference's
draw_schemas.py renders schemas with PK/FK edges via graphviz).

Driver-side utility, two levels of fidelity:

- ``constraint_graph(specs)``: one record node per TableSpec, one edge
  per FK/JK — the quick spec-set view.
- ``dot_from_registry(registry)``: the draw_schemas.py-shaped render
  over compiled JSON Schemas (schemas.load_schemas output): HTML-table
  nodes with a schema-title header (+ $id subscript, like
  draw_schemas.py:238), one row per property path with per-property
  PORTS, key-role badges (PK/UQ/IX with names and limit_scope), and
  FK/JK edges drawn port-to-port into the referenced key's member row
  (⇔ the reference's edge targets, draw_schemas.py:552-569).

No graphviz dependency; the strings render with any dot binary.
"""

from __future__ import annotations

import html
from typing import Mapping, Sequence

from .spec import TableSpec


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def constraint_graph(specs: Sequence[TableSpec]) -> str:
    lines = [
        "digraph constraints {",
        "  rankdir=LR;",
        '  node [shape=record, fontname="Helvetica"];',
    ]
    for s in specs:
        rows = [f"<name> {_esc(s.name)}"]
        for ks in s.primary_keys:
            rows.append(f"PK {_esc(ks.label)}")
        for ks in s.unique:
            rows.append(f"UQ {_esc(ks.label)}")
        for ks in s.indexes:
            rows.append(f"IX {_esc(ks.label)}")
        if s.checks:
            rows.append(f"{len(s.checks)} row checks")
        label = "|".join(rows)
        lines.append(f'  "{_esc(s.name)}" [label="{label}"];')
    for s in specs:
        for kind, fks, style in (
            ("FK", s.foreign_keys, "solid"),
            ("JK", s.join_keys, "dashed"),
        ):
            for fk in fks:
                lbl = ",".join(fk.members)
                if fk.refers_to:
                    lbl += f" -> {fk.refers_to}"
                lines.append(
                    f'  "{_esc(s.name)}" -> "{_esc(fk.ref_table)}" '
                    f'[label="{_esc(lbl)}", style={style}];'
                )
    lines.append("}")
    return "\n".join(lines)


def _port(path: str) -> str:
    """DOT port id for a property path (ports may not contain dots)."""
    out = []
    for ch in path:
        out.append(ch if ch.isalnum() else "_")
    return "p_" + "".join(out)


def dot_from_registry(registry: Mapping, title: str = "schemas") -> str:
    """draw_schemas.py-shaped DOT over compiled schemas
    ({uri: CompiledSchema} from schemas.load_schemas)."""
    lines = [
        "digraph schemas {",
        f'  graph [rankdir=LR, ranksep=2, fontname="Sans-Serif", '
        f"labelloc=t, label=<{html.escape(title)}>];",
        "  node [shape=none];",
    ]
    edges = []
    for uri in sorted(registry):
        cs = registry[uri]
        spec = cs.table_spec
        node = _port(uri)

        # property rows: every path the schema references, with roles
        paths = set(cs.instance_paths) | set(cs.value_paths)
        roles: dict = {p: [] for p in paths}
        for badge, keys in (("PK", spec.primary_keys), ("UQ", spec.unique),
                            ("IX", spec.indexes)):
            for ks in keys:
                tag = badge
                if ks.name:
                    tag += f" {ks.name}"
                if ks.limit_scope:
                    tag += " (scoped)"
                for m in ks.members:
                    roles.setdefault(m, []).append(tag)
        for fkind, fks in (("FK", spec.foreign_keys), ("JK", spec.join_keys)):
            for fk in fks:
                tag = f"{fkind} → {fk.ref_table}"
                if fk.refers_to:
                    tag += f".{fk.refers_to}"
                roles.setdefault(fk.members[0], []).append(tag)
                for m in fk.members[1:]:
                    roles.setdefault(m, [])

        name = cs.schema.get("title") or uri
        rows = [
            '<TR><TD COLSPAN="2" ALIGN="CENTER" PORT="schema" '
            'BGCOLOR="lightgreen"><FONT POINT-SIZE="16">'
            + html.escape(str(name))
            + '</FONT><BR/><FONT POINT-SIZE="8">'
            + html.escape(uri)
            + "</FONT></TD></TR>"
        ]
        for p in sorted(roles):
            badge = html.escape(", ".join(roles[p]))
            rows.append(
                f'<TR><TD ALIGN="LEFT" PORT="{_port(p)}">{html.escape(p)}'
                f"</TD><TD ALIGN=\"LEFT\">{badge}</TD></TR>"
            )
        label = (
            '<TABLE BORDER="0" CELLBORDER="1" CELLSPACING="0">'
            + "".join(rows)
            + "</TABLE>"
        )
        lines.append(f"  {node} [label=<{label}>];")

        # edges: FK/JK member row → referenced key's member row
        for fks, style in ((spec.foreign_keys, "solid"), (spec.join_keys, "dashed")):
            for fk in fks:
                tgt = registry.get(fk.ref_table)
                tgt_port = "schema"
                if tgt is not None and fk.refers_to:
                    pool = (
                        tgt.table_spec.primary_keys
                        if style == "solid"
                        else tgt.table_spec.indexes
                    )
                    for ks in pool:
                        if ks.name == fk.refers_to:
                            tgt_port = _port(ks.members[0])
                            break
                elif tgt is not None and tgt.table_spec.primary_keys:
                    tgt_port = _port(tgt.table_spec.primary_keys[0].members[0])
                edges.append(
                    f'  {node}:{_port(fk.members[0])} -> '
                    f"{_port(fk.ref_table)}:{tgt_port} [style={style}];"
                )
    lines.extend(edges)
    lines.append("}")
    return "\n".join(lines)
