"""Column-level lineage from the ANALYZED logical plan — which source
columns feed each output column.

At 100 TB this is the impact-analysis tool: before changing or
dropping a source column, ask every report which outputs depend on
it; before debugging a wrong aggregate, see exactly which scan
columns it folds in. The reference engine has no plan introspection
at all (its SQL is hand-assembled strings); Spark's analyzed plan
carries the full expression graph, so lineage falls out of walking
it — no query execution, no data touched.

Mechanics: ``DataFrame._jdf.queryExecution().analyzed().toJSON()``
serializes the plan as a flattened preorder node list; expression
trees inside node fields use the same flattened encoding. Every
``Alias`` maps its exprId to the AttributeReference exprIds in its
subtree; leaf relations declare the root attribute ids. Lineage =
transitive closure from the plan's output attributes down to leaf
attributes.

Known approximations (documented, asserted in tests):
  - UNION: output attrs alias only the FIRST child's columns; the
    other branches' columns resolve through them implicitly.
  - Generate (explode/posexplode/inline): generator-output attrs are
    linked to every column the generator expression references — an
    exploded token column resolves to the text column it came from.
  - Python-UDF boundaries (mapInPandas/UDTF) mint fresh attrs with
    no expression children: such columns resolve to an empty source
    set, reported as ``opaque=True``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_ATTR = "org.apache.spark.sql.catalyst.expressions.AttributeReference"
_ALIAS = "org.apache.spark.sql.catalyst.expressions.Alias"


def _expr_id(obj: dict) -> tuple[str, int]:
    e = obj["exprId"]
    return (e["jvmId"], e["id"])


def _iter_expr_trees(value):
    """Yield flattened-preorder expression node lists nested anywhere
    inside a plan-node field value."""
    if isinstance(value, list):
        if value and isinstance(value[0], dict) and "class" in value[0]:
            yield value
        else:
            for v in value:
                yield from _iter_expr_trees(v)


def _subtree_refs(nodes: list[dict], start: int) -> tuple[int, set]:
    """Consume the preorder subtree rooted at ``start``; return
    (next_index, attribute exprIds referenced inside it)."""
    node = nodes[start]
    refs = set()
    if node["class"] == _ATTR:
        refs.add(_expr_id(node))
    i = start + 1
    for _ in range(node.get("num-children", 0)):
        i, sub = _subtree_refs(nodes, i)
        refs |= sub
    return i, refs


@dataclass
class ColumnLineage:
    """Lineage for one output column."""

    name: str
    sources: set  # {(leaf_label, source_column_name), ...}
    opaque: bool = False  # True when the attr has no resolvable edge


@dataclass
class LineageReport:
    columns: list[ColumnLineage]
    leaves: dict = field(default_factory=dict)  # label -> [col, ...]

    def sources_of(self, col: str) -> set:
        for c in self.columns:
            if c.name == col:
                return c.sources
        raise KeyError(col)


def column_lineage(df: DataFrame) -> LineageReport:
    """Resolve each output column of ``df`` to the leaf-relation
    columns it derives from. Leaves are labeled ``leaf<N>`` in plan
    preorder (N is stable for a given query shape)."""
    qe = df._jdf.queryExecution()  # noqa: SLF001
    plan = json.loads(qe.analyzed().toJSON())

    # 1) alias edges + leaf attribute registry
    edges: dict = {}  # exprId -> set of exprIds it references
    leaf_attrs: dict = {}  # exprId -> (leaf_label, col_name)
    leaves: dict = {}
    for node in plan:
        is_leaf = node.get("num-children", 0) == 0
        if is_leaf:
            label = f"leaf{len(leaves)}"
            cols = []
            for tree in _iter_expr_trees(node.get("output", [])):
                for obj in tree:
                    if obj["class"] == _ATTR:
                        leaf_attrs[_expr_id(obj)] = (label, obj["name"])
                        cols.append(obj["name"])
            leaves[label] = cols
            continue
        if node["class"].endswith(".Generate"):
            # explode/posexplode/inline: every generator-output attr
            # derives from the generator expression's references
            gen_refs = set()
            for tree in _iter_expr_trees(node.get("generator", [])):
                _, refs = _subtree_refs(tree, 0)
                gen_refs |= refs
            for tree in _iter_expr_trees(node.get("generatorOutput", [])):
                for obj in tree:
                    if obj["class"] == _ATTR:
                        edges.setdefault(_expr_id(obj), set()).update(
                            gen_refs - {_expr_id(obj)}
                        )
        for key, value in node.items():
            if key in ("class", "num-children", "generatorOutput"):
                continue
            for tree in _iter_expr_trees(value):
                i = 0
                while i < len(tree):
                    obj = tree[i]
                    if obj["class"] == _ALIAS:
                        nxt, refs = _subtree_refs(tree, i)
                        edges.setdefault(_expr_id(obj), set()).update(
                            refs - {_expr_id(obj)}
                        )
                        i = nxt
                    else:
                        i += 1

    # 2) output attributes (name + exprId) via py4j — the analyzed
    #    plan's output order matches df.columns
    jout = qe.analyzed().output()
    outputs = []
    for i in range(jout.size()):
        attr = jout.apply(i)
        eid = attr.exprId()
        outputs.append((attr.name(), (eid.jvmId().toString(), eid.id())))

    # 3) closure from each output id to leaf attrs
    def resolve(eid, seen) -> set:
        if eid in seen:
            return set()
        seen.add(eid)
        if eid in leaf_attrs:
            return {leaf_attrs[eid]}
        out = set()
        for ref in edges.get(eid, ()):  # no edge -> opaque (empty)
            out |= resolve(ref, seen)
        return out

    cols = []
    for name, eid in outputs:
        srcs = resolve(eid, set())
        cols.append(ColumnLineage(name, srcs, opaque=not srcs))
    return LineageReport(cols, leaves)
