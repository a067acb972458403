"""Connected components over candidate-pair graphs — dedup clustering.

A training-data dedup pipeline doesn't stop at near-dup PAIRS: documents
dedup in CLUSTERS (a≈b, b≈c ⇒ {a,b,c} keep one representative). This is
the pair→cluster step: undirected connected components labeled by the
component's minimum vertex id, in pure DataFrame ops.

Algorithm: min-label propagation WITH pointer doubling — each round
every vertex takes the min label among itself and its neighbors (one
join + one groupBy-min), then labels are compressed one hop
(comp[v] := comp[comp[v]], a self-join on the label table — valid
because every label is itself a vertex, and monotone because
comp[x] ≤ x). The compression doubles the propagation distance per
round, so convergence is O(log diameter) shuffles instead of
O(diameter) — the same doubling idea as Kiveris et al.'s
large-star/small-star ("Connected Components in MapReduce and
Beyond"), but applied to the (v, comp) table so edges are never
rewritten. comp values only ever decrease, so the global sum strictly
decreases until fixpoint, making `sum unchanged` an exact convergence
test costing one tiny aggregate per round.

Each round's label table is localCheckpoint(eager=True)'d: persist()
alone caches DATA but leaves the logical plan intact, and the per-round
self-join would double that plan every iteration — Catalyst re-analyzes
the whole history and the driver OOMs on a 40-vertex path. The local
checkpoint truncates lineage to a LogicalRDD, so every round analyzes a
constant-size plan; superseded checkpoint RDDs are released by Spark's
ContextCleaner as the Python references drop each round.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def star_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                    max_iter: int = 200,
                    reliable_checkpoint_dir: str | None = None
                    ) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR edge
    rewrites (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the log-round fallback for graphs whose diameter defeats
    the doubling budget of ``connected_components``.

    Each round rewrites the EDGE SET (never materializing neighborhoods):

      * large-star — every edge (u, v) with v > u becomes (v, m(u)),
        m(u) = min(Γ(u) ∪ {u}): one groupBy-min + one join per round;
        strictly larger neighbors hook onto u's best-known minimum.
      * small-star — every node u with smaller neighbors N = {v < u}
        connects itself and all of N to m = min(N): edges point
        monotonically downhill and components collapse toward stars
        centered at their minimum.

    Both operations preserve connectivity exactly (no approximation);
    the alternation converges in O(log n) rounds w.h.p. Convergence is
    detected when a full round leaves the (distinct, canonicalized)
    edge set unchanged — an exceptAll emptiness probe, exact rather
    than heuristic. Labels then read off the star edges; isolated /
    self-loop-only vertices keep themselves as component.
    """
    if reliable_checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(
            reliable_checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    raw = edges.select(F.col(src).cast("long").alias("s"),
                       F.col(dst).cast("long").alias("d"))
    verts = (raw.select(F.col("s").alias("v"))
             .unionByName(raw.select(F.col("d").alias("v")))
             .distinct().localCheckpoint(eager=True))
    # canonical undirected edge set, self-loops dropped
    e = ckpt(raw.filter(F.col("s") != F.col("d"))
             .select(F.least("s", "d").alias("s"),
                     F.greatest("s", "d").alias("d")).distinct())

    def sym(t: DataFrame) -> DataFrame:
        return t.unionByName(t.select(F.col("d").alias("s"),
                                      F.col("s").alias("d")))

    for _round in range(max_iter):
        # ---- large-star
        g = sym(e)
        m_u = (g.groupBy("s").agg(F.min("d").alias("_md"))
               .select("s", F.least("_md", F.col("s")).alias("m")))
        large = (g.filter(F.col("d") > F.col("s"))
                 .join(m_u, "s")
                 .select(F.col("m").alias("s"), F.col("d").alias("d"))
                 .filter(F.col("s") != F.col("d")).distinct())
        # ---- small-star (edges now high -> low; group smaller nbrs)
        g2 = sym(large)
        lt = g2.filter(F.col("d") < F.col("s"))
        m2 = lt.groupBy("s").agg(F.min("d").alias("m"))
        joined = lt.join(m2, "s")
        small = (joined.select(F.col("m").alias("s"),
                               F.col("s").alias("d"))
                 .unionByName(joined.select(F.col("m").alias("s"),
                                            F.col("d").alias("d")))
                 .filter(F.col("s") != F.col("d")).distinct())
        new_e = ckpt(small.select(F.least("s", "d").alias("s"),
                                  F.greatest("s", "d").alias("d"))
                     .distinct())
        unchanged = (new_e.count() == e.count()
                     and new_e.exceptAll(e).isEmpty())
        e = new_e
        if unchanged:
            break
    else:
        raise RuntimeError(
            f"star_components: no fixpoint in {max_iter} rounds — "
            "the alternation converges in O(log n) w.h.p.; check for "
            "label overflow or a non-deterministic edge source")
    # stars: (center=s) -- (leaf=d); centers label themselves
    lab = (sym(e).groupBy(F.col("s").alias("v"))
           .agg(F.min("d").alias("_md"))
           .select("v", F.least("_md", F.col("v")).alias("comp")))
    return (verts.join(lab, "v", "left")
            .select("v", F.coalesce("comp", F.col("v")).alias("comp")))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         reliable_checkpoint_dir: str | None = None,
                         star_fallback: bool = True) -> DataFrame:
    """(vertex, component) for every vertex with at least one edge;
    component = min vertex id reachable via undirected edges.

    ``reliable_checkpoint_dir``: by default each round truncates lineage
    with ``localCheckpoint`` — blocks live on EXECUTORS, so on a real
    cluster a lost executor kills the job mid-algorithm (fine on
    single-node / fast-retry settings, fastest option). Passing a
    directory (HDFS/S3A at scale) switches every round to a RELIABLE
    ``checkpoint()`` written through ``setCheckpointDir``: rounds survive
    executor loss at the cost of one distributed write per round — the
    right trade at 100 TB where a multi-hour job must not restart from
    round 0.

    If no fixpoint is reached within ``max_iter`` rounds (the doubling
    budget covers diameter ≈ 2^max_iter, so this needs a pathological
    graph), the computation DEGRADES to ``star_components`` — the
    Kiveris et al. large-star/small-star alternation — instead of
    aborting a multi-hour job; pass ``star_fallback=False`` to get the
    old RuntimeError behavior.
    """
    if reliable_checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(
            reliable_checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("d"))
    sym = e.unionByName(e.select(F.col("d").alias("s"),
                                 F.col("s").alias("d")))
    # read every round (the propagation join); released before return —
    # the returned label table is checkpointed, so it no longer depends
    # on this cache
    sym = sym.persist()
    try:
        lab = ckpt(sym.select(F.col("s").alias("v")).distinct()
                   .withColumn("comp", F.col("v")))
        total = lab.agg(F.sum("comp")).collect()[0][0]
        if total is None:
            return lab  # no edges
        for _round in range(max_iter):
            prop = (sym.join(lab, sym["s"] == lab["v"])
                    .select(F.col("d").alias("v"), F.col("comp")))
            stepped = (lab.unionByName(prop).groupBy("v")
                       .agg(F.min("comp").alias("comp")))
            # pointer doubling: comp[v] := comp[comp[v]] — every label is
            # a vertex, so the self-join always resolves; comp[x] <= x
            # keeps the update monotone
            a, b = stepped.alias("a"), stepped.alias("b")
            new = ckpt(a.join(b, F.col("a.comp") == F.col("b.v"), "left")
                       .select(F.col("a.v").alias("v"),
                               F.coalesce(F.col("b.comp"), F.col("a.comp"))
                               .alias("comp")))
            new_total = new.agg(F.sum("comp")).collect()[0][0]
            converged = new_total == total  # comp monotone non-increasing
            lab, total = new, new_total
            if converged:
                return lab
        if not star_fallback:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter} rounds "
                "(graph diameter too large); star_fallback=True would "
                "degrade to large-star/small-star instead")
        logger.warning(
            "connected_components: no fixpoint in %d doubling rounds — "
            "degrading to large-star/small-star (Kiveris et al.)",
            max_iter)
        return star_components(
            edges, src, dst,
            reliable_checkpoint_dir=reliable_checkpoint_dir)
    finally:
        sym.unpersist()


def dedup_representatives(pairs: DataFrame, id_a: str = "id_a",
                          id_b: str = "id_b") -> DataFrame:
    """(doc_id, keep) from a near-dup pair table: every document of a
    component maps to the component's min id as its canonical survivor —
    the keep/drop decision a dedup pipeline applies after LSH."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.select(F.col("v").alias("doc_id"),
                       F.col("comp").alias("keep"))
