"""ANN index lifecycle: persist, load, and incrementally extend an
IVF+PQ index as plain parquet tables.

A production vector index is not rebuilt per query — it is trained
once, stored, appended to as the corpus grows, and retrained only when
drift warrants it (the FAISS add/train split). The same split maps
cleanly onto Spark storage:

- trained artifacts (coarse centroids, PQ sub-codebooks) are TINY
  (ncells×dim + m×ksub×dim/m floats) and live as small parquet tables;
- the per-vector payload (cell id + m code ints) is the big table,
  partitioned by cell so a probe-driven search scans only probed
  cells' files (partition pruning does the nprobe cut at the STORAGE
  layer, before any executor touches a row);
- appending a new batch reuses the frozen artifacts: assign cells,
  take residuals, encode — one scan of the batch, zero training, an
  append write. Quantization error on drifted data grows gracefully
  and is the signal to retrain.

Reference intent: the reference persists model artifacts between
sessions (02_var_model.py save/load weights); this is the ANN-index
analogue through the same Registry storage layer.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from value_at_risk_spark.operators.similarity import (
    nearest_cell_expr,
    pq_encode,
)
from value_at_risk_spark.sources.registry import Registry


def save_ivfpq_index(
    spark: SparkSession,
    base_dir: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    codes_df: DataFrame,
) -> None:
    """Persist (centroids, codebooks, codes) under ``base_dir`` as the
    tables ``ann_centroids`` / ``ann_codebooks`` / ``ann_codes``. The
    codes table is partitioned by ``_cell`` so nprobe search prunes
    whole directories."""
    reg = Registry(base_dir)
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    reg.write(
        spark.createDataFrame(cent_rows, "cell int, v array<double>"),
        "ann_centroids",
        num_files=1,
    )
    cb_rows = [
        (j, c, [float(x) for x in vec])
        for j, book in enumerate(codebooks)
        for c, vec in enumerate(book)
    ]
    reg.write(
        spark.createDataFrame(cb_rows, "j int, code int, v array<double>"),
        "ann_codebooks",
        num_files=1,
    )
    reg.write(codes_df, "ann_codes", partition_keys=["_cell"])


def load_ivfpq_index(
    spark: SparkSession, base_dir: str
) -> tuple[list[list[float]], list[list[list[float]]], DataFrame]:
    """Load the trained artifacts (collected — they are kilobytes) and
    the codes table (LAZY — it is the corpus-sized side and stays a
    partition-prunable scan)."""
    reg = Registry(base_dir)
    cents = [
        list(r.v)
        for r in sorted(
            reg.read(spark, "ann_centroids").collect(), key=lambda r: r.cell
        )
    ]
    cb_rows = reg.read(spark, "ann_codebooks").collect()
    m = max(r.j for r in cb_rows) + 1
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(cb_rows, key=lambda r: (r.j, r.code)):
        books[r.j].append(list(r.v))
    codes = reg.read(spark, "ann_codes")
    return cents, books, codes


def save_pq_index(
    spark: SparkSession,
    base_dir: str,
    codebooks: list[list[list[float]]],
    codes_df: DataFrame,
    rotation: list[list[float]] | None = None,
) -> None:
    """Persist a FLAT-PQ index (no coarse cells): sub-codebooks + the
    per-vector code table, plus the optional OPQ rotation matrix (row
    i = the principal component assigned to output position i). Same
    Registry storage layer as the IVF+PQ lifecycle; the codes table is
    the corpus-sized side and stays a plain scan (flat PQ has no cell
    key to prune on — that is IVF's job)."""
    reg = Registry(base_dir)
    cb_rows = [
        (j, c, [float(x) for x in vec])
        for j, book in enumerate(codebooks)
        for c, vec in enumerate(book)
    ]
    reg.write(
        spark.createDataFrame(cb_rows, "j int, code int, v array<double>"),
        "ann_codebooks",
        num_files=1,
    )
    if rotation is not None:
        rot_rows = [(i, [float(x) for x in r]) for i, r in enumerate(rotation)]
        reg.write(
            spark.createDataFrame(rot_rows, "i int, v array<double>"),
            "ann_rotation",
            num_files=1,
        )
    reg.write(codes_df, "ann_pq_codes")


def load_pq_index(
    spark: SparkSession, base_dir: str
) -> tuple[
    list[list[list[float]]], DataFrame, list[list[float]] | None
]:
    """Load (codebooks, codes, rotation-or-None). Artifacts collect
    (kilobytes); the codes table stays lazy."""
    reg = Registry(base_dir)
    cb_rows = reg.read(spark, "ann_codebooks").collect()
    m = max(r.j for r in cb_rows) + 1
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(cb_rows, key=lambda r: (r.j, r.code)):
        books[r.j].append(list(r.v))
    rotation = None
    if os.path.exists(reg.path("ann_rotation")):
        rot_rows = reg.read(spark, "ann_rotation").collect()
        rotation = [
            list(r.v) for r in sorted(rot_rows, key=lambda r: r.i)
        ]
    return books, reg.read(spark, "ann_pq_codes"), rotation


#: per-process record of cache outcomes, appended by ensure_index:
#: (kind_and_key_basename, "cold" | "warm"). Sweep/bench harnesses
#: drain this so every recorded pq/ivfpq/opq timing says which of the
#: two bimodal cost modes (train vs load) it measured.
BUILD_EVENTS: list[tuple[str, str]] = []

_CODE_SALT: str | None = None

#: bounded cache: newest entries kept per kind (GC in ensure_index)
CACHE_KEEP_PER_KIND = 8


def _code_salt() -> str:
    """Hash of the modules whose training/encoding output the cached
    artifacts embody. Folded into the cache key so editing pq_train /
    ivfpq_build / opq_rotation invalidates every prior index — without
    this, gate runs after a code change silently load artifacts
    trained by the OLD code, and cold/warm equality tests cannot catch
    it because both paths read the same stale cache."""
    global _CODE_SALT
    if _CODE_SALT is None:
        h = hashlib.md5()
        here = os.path.dirname(os.path.abspath(__file__))
        for mod in ("similarity.py", "annindex.py"):
            try:
                with open(os.path.join(here, mod), "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(mod.encode())
        _CODE_SALT = h.hexdigest()[:12]
    return _CODE_SALT


def cache_root() -> str:
    """Per-user cache root: a world-shared /tmp name invites
    cross-user collisions (EACCES on a root another uid created,
    or loading an index another user published)."""
    uid = getattr(os, "getuid", lambda: "u")()
    return os.path.join(
        tempfile.gettempdir(), f"vars_ann_index_cache_{uid}"
    )


def index_cache_dir(kind: str, sf_dir: str, params: dict) -> str:
    """Deterministic on-disk location for a trained index over a fixture
    corpus, keyed by (kind, sf_dir, corpus fingerprint, params, code
    salt). The fingerprint is the embeddings parquet's (mtime_ns, size)
    so a regenerated fixture invalidates the cache instead of serving
    stale artifacts; the code salt (hash of similarity.py + annindex.py)
    does the same for trainer/encoder changes. This is what lets the
    GATE queries train once per box and load thereafter — at 100 TB an
    index is trained once per corpus, never once per query (the FAISS
    add/train split the module docstring describes)."""
    fp: list = []
    emb = os.path.join(sf_dir, "embeddings.parquet")
    try:
        if os.path.isdir(emb):
            for f in sorted(os.listdir(emb)):
                st = os.stat(os.path.join(emb, f))
                fp.append((f, st.st_mtime_ns, st.st_size))
        else:
            st = os.stat(emb)
            fp.append((st.st_mtime_ns, st.st_size))
    except OSError:
        fp.append("unknown")
    key = hashlib.md5(
        json.dumps(
            {
                "kind": kind,
                "sf": os.path.abspath(sf_dir),
                "fp": fp,
                "code": _code_salt(),
                **params,
            },
            sort_keys=True,
            default=str,
        ).encode()
    ).hexdigest()[:16]
    return os.path.join(cache_root(), f"{kind}_{key}")


def _gc_cache(root: str, kind: str) -> None:
    """Keep the most-recently-USED CACHE_KEEP_PER_KIND entries per
    kind (warm hits touch mtime), and never evict anything used within
    the grace window — a reader that passed the existence check moments
    ago must not have its parquet deleted mid-load by a concurrent
    builder's GC."""
    import time as _time

    grace = _time.time() - 600
    try:
        entries = [
            (os.path.getmtime(os.path.join(root, d)), d)
            for d in os.listdir(root)
            if d.startswith(f"{kind}_") and ".staging." not in d
        ]
    except OSError:
        return
    for mt, d in sorted(entries, reverse=True)[CACHE_KEEP_PER_KIND:]:
        if mt < grace:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def ensure_index(base_dir: str, build: Callable[[str], None]) -> str:
    """Build-or-load gatekeeper: if ``base_dir`` exists (a completed
    build — publication is an atomic rename, so existence implies
    completeness), return it untouched; otherwise run ``build`` into a
    pid-keyed sibling staging dir and atomically rename it into place.
    A concurrent builder losing the rename race discards its staging
    dir and uses the winner's — readers can never observe a torn
    index. Every call appends (entry name, cold|warm) to BUILD_EVENTS
    so harnesses can stamp which cost mode a timing measured."""
    name = os.path.basename(base_dir)
    if os.path.isdir(base_dir):
        BUILD_EVENTS.append((name, "warm"))
        try:
            os.utime(base_dir)  # LRU signal for the GC below
        except OSError:
            pass
        return base_dir
    BUILD_EVENTS.append((name, "cold"))
    os.makedirs(os.path.dirname(base_dir), exist_ok=True)
    staging = f"{base_dir}.staging.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    try:
        build(staging)
        try:
            os.rename(staging, base_dir)
        except OSError:
            # a lost publish race is fine ONLY if the winner's index is
            # actually there; a genuine failure (EACCES, EXDEV) must
            # surface here, not as a missing-table error in the loader
            if not os.path.isdir(base_dir):
                raise
            shutil.rmtree(staging, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # GC only inside the managed cache root — ensure_index accepts any
    # target dir, and pruning siblings of a caller-owned path would be
    # a destructive surprise
    parent = os.path.dirname(base_dir)
    if os.path.basename(parent).startswith("vars_ann_index_cache"):
        _gc_cache(parent, name.split("_", 1)[0])
    return base_dir


def append_to_ivfpq(
    spark: SparkSession,
    base_dir: str,
    new_vectors: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally index a new vector batch against the FROZEN
    artifacts: nearest-cell assignment + residual + PQ encode (one
    scan, pure codegen + one small join) and an append write into the
    cell-partitioned codes table. No retraining, no touch of existing
    codes — the per-increment cost profile a daily embedding feed
    needs. Search sees the new vectors on its next scan."""
    cents, books, _ = load_ivfpq_index(spark, base_dir)
    cents_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    assigned = new_vectors.select(
        F.col(corpus_id),
        F.col(vec_col),
        nearest_cell_expr(vec_col, cents).alias("_cell"),
    ).withColumn(
        "_resid",
        F.zip_with(
            F.col(vec_col),
            F.element_at(cents_lit, F.col("_cell") + 1),
            lambda a, b: a - b,
        ),
    )
    codes = pq_encode(
        assigned.select(corpus_id, "_cell", F.col("_resid").alias(vec_col)),
        books,
        id_col=corpus_id,
        vec_col=vec_col,
    )
    codes_df = assigned.select(corpus_id, "_cell").join(codes, corpus_id)
    Registry(base_dir).write(
        codes_df, "ann_codes", mode="append", partition_keys=["_cell"]
    )
