"""Constraint-graph export (SURVEY.md §2.1 S10 — the reference's
draw_schemas.py renders schemas with PK/FK edges via graphviz).

Driver-side utility: emits a DOT digraph of the spec set — one node
per table (listing keys and row checks), one edge per FK/JK.  No
graphviz dependency; the string renders with any dot binary.
"""

from __future__ import annotations

from typing import Sequence

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
