"""Driver-side tree renderer (print_tree semantics,
hierarchies.py:178-347): tcsort+natsort child order, multi-parent
' *' marking with single subtree expansion, html variant."""

from pyontutils_spark.operators.tree import (
    build_children, render_tree, render_tree_html)

EDGES = [("b1", "a"), ("b2", "a"), ("c1", "b1"), ("c2", "b1"),
         ("d", "b1"), ("d", "b2"), ("e", "c1")]


def test_render_tree_structure_and_multiparent():
    out = render_tree(EDGES, "a")
    lines = out.splitlines()
    assert lines[0] == "a"
    # multi-parent node marked everywhere, subtree expanded once
    assert out.count("d *") == 2
    # bigger subtrees (by closure size) come later among siblings
    assert out.index("b2") < out.index("b1")
    # chain under c1 is present exactly once
    assert out.count("e") == 1
    assert render_tree(EDGES, "a") == out  # deterministic


def test_render_tree_natsort_siblings():
    edges = [("x10", "r"), ("x9", "r"), ("x2", "r")]
    out = render_tree(edges, "r")
    assert out.index("x2") < out.index("x9") < out.index("x10")


def test_render_tree_labels_and_html():
    out = render_tree(EDGES, "a", label={"a": "ROOT", "b1": "B-one"})
    assert out.startswith("ROOT") and "B-one" in out
    html = render_tree_html(EDGES, "a")
    assert html.startswith("<pre>") and "&gt;" not in html.split("──")[0]


def test_render_tree_cycle_guard():
    # a cycle must not hang the size computation
    edges = [("x", "y"), ("y", "x"), ("z", "x")]
    out = render_tree(edges, "x")
    assert "z" in out


def test_build_children():
    ch = build_children(EDGES)
    assert set(ch["a"]) == {"b1", "b2"}
    assert set(ch["b1"]) == {"c1", "c2", "d"}
