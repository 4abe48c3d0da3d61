"""Driver-side tree renderer — the presentation end of the hierarchy
operators (reference ``pyontutils/hierarchies.py:178-347``:
``print_tree`` over the nested ``tree`` defaultdict).

This is deliberately a DRIVER-side step: it renders an already-pruned,
human-sized subtree (the distributed part — closure, prune,
dematerialize, subtree sizes — happens in operators/hierarchy.py).
Reference semantics kept:

- children ordered by transitive-closure size (``tcsort``,
  hierarchies.py:47-49) then natsort of the label,
- multi-parent nodes render their subtree once and are marked
  ``' *'`` at later occurrences (the ``existing`` bookkeeping,
  hierarchies.py:225-231; dematerialize semantics),
- box-drawing stems like the reference's MID_STEM/END output.
"""

from __future__ import annotations

from collections import defaultdict

from ..kernel.norm import natsort_key

MID_STEM = "├── "
END_STEM = "└── "
PIPE = "│   "
GAP = "    "


def build_children(edges: list[tuple[str, str]]) -> dict[str, list[str]]:
    """(child, parent) rows -> parent -> [children] adjacency."""
    ch: dict[str, list[str]] = defaultdict(list)
    for child, parent in edges:
        ch[parent].append(child)
    return ch


def _closure_sizes(children: dict[str, list[str]]) -> dict[str, int]:
    sizes: dict[str, int] = {}

    def size(node, stack):
        if node in sizes:
            return sizes[node]
        if node in stack:  # cycle guard
            return 0
        stack.add(node)
        s = sum(1 + size(c, stack) for c in children.get(node, ()))
        stack.discard(node)
        sizes[node] = s
        return s

    for n in list(children):
        size(n, set())
    return sizes


def render_tree(edges: list[tuple[str, str]], root: str,
                label: dict[str, str] | None = None) -> str:
    """ASCII tree for the subtree under ``root``.

    ``edges``: (child, parent) rows (e.g. collected from a pruned
    hierarchy DataFrame).  ``label``: optional iri->display map."""
    children = build_children(edges)
    sizes = _closure_sizes(children)
    n_parents: dict[str, int] = defaultdict(int)
    for child, _ in edges:
        n_parents[child] += 1
    lab = (lambda n: label.get(n, n)) if label else (lambda n: n)

    seen: set[str] = set()
    lines: list[str] = [lab(root)]

    def walk(node: str, prefix: str, path: frozenset):
        kids = children.get(node, [])
        # tcsort (size) then natsort of the label — reference order
        kids = sorted(sorted(kids, key=lambda k: natsort_key(lab(k))),
                      key=lambda k: sizes.get(k, 0))
        for i, kid in enumerate(kids):
            last = i == len(kids) - 1
            stem = END_STEM if last else MID_STEM
            if kid in path:  # cycle: mark and stop descending
                lines.append(f"{prefix}{stem}{lab(kid)} <cycle>")
                continue
            multi = n_parents.get(kid, 0) > 1
            mark = " *" if multi else ""
            if multi and kid in seen:
                lines.append(f"{prefix}{stem}{lab(kid)}{mark}")
                continue  # subtree rendered at first occurrence only
            seen.add(kid)
            lines.append(f"{prefix}{stem}{lab(kid)}{mark}")
            walk(kid, prefix + (GAP if last else PIPE), path | {kid})

    walk(root, "", frozenset({root}))
    return "\n".join(lines) + "\n"


def render_tree_html(edges: list[tuple[str, str]], root: str,
                     label: dict[str, str] | None = None) -> str:
    """<pre> variant (the html=True path of print_tree)."""
    import html as _h
    return "<pre>\n" + _h.escape(render_tree(edges, root, label)) + \
        "</pre>\n"
