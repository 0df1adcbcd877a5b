"""zed pipeline operators, each a DataFrame -> DataFrame function.

Inventory mirrors SURVEY.md §2 / the reference's dag.Op sum type
(reference: compiler/ast/dag/op.go:28-171). Every operator is
declarative DataFrame API so Catalyst plans the physical execution.
"""

from zed_spark.operators.filters import where
from zed_spark.operators.project import cut, drop, put, rename, yield_
from zed_spark.operators.sorting import head, sort, tail, top, uniq
from zed_spark.operators.summarize import summarize
from zed_spark.operators.join import join
from zed_spark.operators.combine import combine, fork, merge, mirror, switch
from zed_spark.operators.fuse import fuse, fuse_dataframes
from zed_spark.operators.traverse import explode_op, over
from zed_spark.operators.shape_op import shape_to

__all__ = [
    "where", "cut", "drop", "put", "rename", "yield_",
    "head", "sort", "tail", "top", "uniq",
    "summarize", "join",
    "combine", "fork", "merge", "mirror", "switch",
    "fuse", "fuse_dataframes", "explode_op", "over", "shape_to",
]
