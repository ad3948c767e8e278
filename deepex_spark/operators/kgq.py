"""KG quality & consistency operators: contradiction detection, truth
discovery, and RDFS-style type-closure inference.

These are the post-construction steps a web-scale KG pipeline runs after
edge assembly (reference: the merged triple store built by
``scripts/run.py`` stages, deepex README pipeline overview) — the
reference stops at ranked triples; resolving CONFLICTING triples and
propagating ontology types is what makes the output a usable KG:

* ``conflict_report`` — find subjects asserted with ≥ 2 distinct values
  for a (implicitly functional) predicate, with per-value distinct-source
  support. Contradiction detection à la NELL / Knowledge Vault triage.
* ``truth_discovery`` — TruthFinder-lite (Yin et al., KDD'07 lineage):
  majority vote → source trust = agreement rate with the vote → ONE
  trust-weighted re-vote. Votes are summed as ``round(trust·10^6)``
  BIGINTs so the re-vote is integer-exact and summation order (which
  differs across engines/partitionings) can never flip a ranking.
* ``subclass_closure`` / ``type_extension`` — transitive ``subClassOf``
  closure by path doubling (log2(depth) self-joins, NOT depth-many
  driver rounds) and the inferred per-type extension counts
  (rdfs:subClassOf + rdf:type entailment).

Scale notes (100 TB): every operator keys its shuffles once —
``conflict_report`` is ONE subject exchange end-to-end (the claim
distinct, the per-value count and the per-subject rollup all satisfy
their ClusteredDistribution from the same subject hash via the subset
rule); ``truth_discovery`` adds one source-keyed exchange for the trust
table, which is then BROADCAST back (sources ≪ claims in any real
corpus) so the re-vote stays on the subject partitioning; the closure
doubling touches only the ontology (tiny vs the instance data) and the
instance join is a broadcast of the closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TRUST_SCALE = 1_000_000  # trust quantum: round(trust·1e6) as BIGINT


def _votes(claims: DataFrame) -> DataFrame:
    """Distinct (subj, val, src) votes, hash-partitioned by subj.

    The explicit repartition is the ONLY subject exchange downstream
    aggregations need: HashPartitioning(subj) satisfies
    ClusteredDistribution for any superset key set (subset rule, pinned
    by tests/test_plan_shape.py), so distinct → per-(subj,val) count →
    per-subj rollup all run exchange-free after it."""
    return (
        claims.select("subj", "val", "src")
        .repartition(F.col("subj"))
        .distinct()
    )


def conflict_report(claims: DataFrame) -> DataFrame:
    """Contradiction detection for a functional predicate: subjects with
    ≥ 2 distinct asserted values, each value weighted by DISTINCT-source
    support (a source repeating itself never inflates a claim).

    Input: ``claims(subj, val, src)``. Output one row per conflicting
    subject: ``n_vals``, the sorted value list, total distinct-source
    votes, and the majority share (rounded — integer counts, one float
    division). One subject-keyed exchange total."""
    sv = _votes(claims).groupBy("subj", "val").agg(
        F.count("*").alias("n_src")
    )
    return (
        sv.groupBy("subj")
        .agg(
            F.count("*").alias("n_vals"),
            F.array_join(F.sort_array(F.collect_list("val")), ",").alias(
                "vals"
            ),
            F.sum("n_src").alias("n_votes"),
            F.max("n_src").alias("top_votes"),
        )
        .where(F.col("n_vals") >= 2)
        .select(
            "subj",
            "n_vals",
            "vals",
            "n_votes",
            F.round(
                F.col("top_votes").cast("double") / F.col("n_votes"), 6
            ).alias("top_share"),
        )
    )


def truth_discovery(claims: DataFrame) -> DataFrame:
    """Resolve conflicting claims by one source-trust iteration
    (TruthFinder-lite): majority vote → per-source trust = fraction of
    its votes that agree with the majority → trust-weighted re-vote.

    Ties break deterministically (support DESC, value ASC) in BOTH
    rounds; trust is quantized to ``round(trust·10^6)`` BIGINT before
    the weighted sum, so the re-vote ranking is integer-exact — float
    summation order across partitions can never flip a winner.

    Output one row per subject: ``resolved_val`` (round-2 winner),
    ``weight`` (its summed trust quanta), ``n_src`` (its distinct
    supporting sources), ``majority_val`` (round-1 winner) and
    ``changed`` (trust moved the verdict).

    Plan: one subject exchange (shared by the vote distinct, both
    per-(subj,val) aggregates and both windows via the subset rule) plus
    one source exchange for the trust table, which is broadcast back —
    sources ≪ claims, so the big side never reshuffles."""
    votes = _votes(claims).persist()
    # Materialize the cache NOW: under AQE an unmaterialized cached plan
    # has no final output partitioning yet, so consumers planned against
    # it re-shuffle (ENSURE_REQUIREMENTS) instead of reusing the subject
    # hash. After this count, every aggregate/window/subject-join below
    # plans exchange-free on top of the one cached exchange
    # (canChangeCachedPlanOutputPartitioning=false in session.py).
    votes.count()

    sv1 = votes.groupBy("subj", "val").agg(F.count("*").alias("n_src"))
    rank1 = Window.partitionBy("subj").orderBy(
        F.desc("n_src"), F.asc("val")
    )
    winner1 = (
        sv1.withColumn("rn", F.row_number().over(rank1))
        .where(F.col("rn") == 1)
        .select("subj", F.col("val").alias("majority_val"))
    )

    trust = (
        votes.join(winner1, "subj")
        .groupBy("src")
        .agg(
            F.round(
                _TRUST_SCALE
                * F.avg(
                    (F.col("val") == F.col("majority_val")).cast("double")
                )
            )
            .cast("long")
            .alias("trust_q")
        )
    )

    sv2 = (
        votes.join(F.broadcast(trust), "src")
        .groupBy("subj", "val")
        .agg(
            F.sum("trust_q").alias("weight"),
            F.count("*").alias("n_src"),
        )
    )
    rank2 = Window.partitionBy("subj").orderBy(
        F.desc("weight"), F.asc("val")
    )
    return (
        sv2.withColumn("rn", F.row_number().over(rank2))
        .where(F.col("rn") == 1)
        .join(winner1, "subj")
        .select(
            "subj",
            F.col("val").alias("resolved_val"),
            "weight",
            "n_src",
            "majority_val",
            (F.col("val") != F.col("majority_val")).alias("changed"),
        )
    )


def inverse_rules(
    edges: DataFrame, min_support: int = 1
) -> DataFrame:
    """AMIE-style inverse-rule mining: for every ordered predicate pair
    (p, q), the support and confidence of the rule ``p(x,y) ⇒ q(y,x)``
    — ``q == p`` rows are symmetry rules. The schema-induction step that
    discovers ``placed/ordered_by``-style inverse pairs (and flags
    near-symmetric predicates) from the assembled KG itself.

    Input ``edges(src, dst, rel)``; facts are deduplicated first so
    repeated evidence can't inflate support. Output one row per
    predicate pair with support ≥ ``min_support``: ``n_p`` (distinct
    facts of p), ``inv_support`` (facts of p whose reverse is a fact of
    q), ``inv_confidence = inv_support / n_p`` (rounded).

    Scale: the candidate join is keyed on the FULL entity pair —
    (src,dst) against (dst,src) — never on the predicate, so predicate
    skew (a 'links-to' that is half the corpus) cannot hot-spot a
    partition; the per-pair rollup is a map-side-combinable count and
    the per-predicate totals join is a broadcast (|predicates| rows)."""
    facts = edges.select("src", "dst", "rel").distinct()
    rev = facts.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("rel").alias("q_rel"),
    )
    pairs = (
        facts.join(rev, ["src", "dst"])
        .groupBy(F.col("rel").alias("p_rel"), "q_rel")
        .agg(F.count("*").alias("inv_support"))
        .where(F.col("inv_support") >= min_support)
    )
    totals = facts.groupBy(F.col("rel").alias("p_rel")).agg(
        F.count("*").alias("n_p")
    )
    return pairs.join(F.broadcast(totals), "p_rel").select(
        "p_rel",
        "q_rel",
        "n_p",
        "inv_support",
        F.round(
            F.col("inv_support").cast("double") / F.col("n_p"), 6
        ).alias("inv_confidence"),
    )


def chain_rules(
    edges: DataFrame,
    min_support: int = 1,
    max_mid_fanout: int | None = None,
) -> DataFrame:
    """AMIE-style chain (composition) rule mining: for every relation
    triple (rel_a, rel_b, head_rel), the support and confidence of the
    horn rule ``rel_a(x,z) ∧ rel_b(z,y) ⇒ head_rel(x,y)`` — the
    length-2 path rules that drive KG completion (AMIE, Galárraga et
    al., WWW'13; the length-1 inverse/symmetry case is
    :func:`inverse_rules`).

    Semantics (all counts over DISTINCT sets, so repeated evidence and
    parallel mid-vertices can't inflate anything):

    * body pair: a distinct (x, y) with ∃z: rel_a(x,z) ∧ rel_b(z,y) and
      y ≠ x (pure backtracks/self-pairs excluded, mirroring
      ``kg_relpath2``'s path definition — a rule instance that returns
      to its own subject is noise, not inference).
    * ``support``   = |{(x,y) body pairs with head_rel(x,y)}|
    * ``confidence``= support / ``n_body``  (standard/CWA confidence)
    * ``pca_confidence`` = support / |{(x,y) body pairs where x has ANY
      head_rel edge}| — AMIE's partial-completeness assumption: a body
      pair only counts against the rule if the KG knows SOMETHING about
      (x, head_rel), so incomplete KGs don't drown true rules.

    ``max_mid_fanout`` caps the path explosion on hub mid-vertices: a
    vertex z contributes in_deg(z)·out_deg(z) raw paths, so z with
    ``in_deg·out_deg > max_mid_fanout`` are excluded from the body —
    the same disclosed-cutoff pattern as the hot-shingle doc-frequency
    cap in n-gram dedup (any SQL oracle must encode the identical
    cutoff). At crawl scale a 'links-to' hub would otherwise emit
    degree² rows; rules through such hubs are statistically worthless
    anyway (everything connects through them).

    Scale: the body join keys on the shared mid-VERTEX — an entity id,
    never a predicate — so predicate skew cannot hot-spot a partition
    (same argument as :func:`inverse_rules`), and the hub cap bounds
    the per-key output; the support and PCA joins key on the full
    entity pair / the subject; every rollup is a map-side-combinable
    count over ≤ |rels|³ groups; the final denominators join is tiny.
    """
    facts = edges.select("src", "dst", "rel").distinct()
    a = facts.select(
        F.col("src").alias("x"), F.col("dst").alias("z"), F.col("rel").alias("rel_a")
    )
    b = facts.select(
        F.col("src").alias("z"), F.col("dst").alias("y"), F.col("rel").alias("rel_b")
    )
    if max_mid_fanout is not None:
        ind = facts.groupBy(F.col("dst").alias("z")).agg(F.count("*").alias("n_in"))
        outd = facts.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("n_out"))
        keep = (
            ind.join(outd, "z")
            .where(F.col("n_in") * F.col("n_out") <= max_mid_fanout)
            .select("z")
        )
        a = a.join(keep, "z")
    body = (
        a.join(b, "z")
        .where(F.col("y") != F.col("x"))
        .select("x", "y", "rel_a", "rel_b")
        .distinct()
    )
    n_body = body.groupBy("rel_a", "rel_b").agg(F.count("*").alias("n_body"))
    heads = facts.select(
        F.col("src").alias("x"), F.col("dst").alias("y"), F.col("rel").alias("head_rel")
    )
    support = (
        body.join(heads, ["x", "y"])
        .groupBy("rel_a", "rel_b", "head_rel")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )
    pca = (
        body.join(heads.select("x", "head_rel").distinct(), "x")
        .groupBy("rel_a", "rel_b", "head_rel")
        .agg(F.count("*").alias("n_pca"))
    )
    return (
        support.join(pca, ["rel_a", "rel_b", "head_rel"])
        .join(F.broadcast(n_body), ["rel_a", "rel_b"])
        .select(
            "rel_a",
            "rel_b",
            "head_rel",
            "n_body",
            "support",
            F.round(F.col("support").cast("double") / F.col("n_body"), 6).alias(
                "confidence"
            ),
            F.round(F.col("support").cast("double") / F.col("n_pca"), 6).alias(
                "pca_confidence"
            ),
        )
    )


def link_prediction_eval(
    test: DataFrame,
    candidates: DataFrame,
    ent_emb,
    rel_emb,
    dim: int = 4,
    salt_buckets: int = 8,
) -> DataFrame:
    """KG-embedding link-prediction evaluation (the standard
    filtered-candidate protocol): for every test triple (subj, rel, obj)
    rank the true object among the SAME relation's candidate objects by
    a DistMult score Σ_j (e_subj·e_rel)_j · e_cand_j, then report
    per-relation hits@1, hits@10 and MRR.

    ``ent_emb(col, j)`` / ``rel_emb(col, j)`` return the j-th embedding
    component as a Column — the caller owns the embedding source, the
    operator owns the ranking protocol. Ranks are deterministic: a
    candidate outranks the truth iff its score is strictly greater OR
    exactly equal with a smaller id (exact float equality is safe
    because both sides of the oracle compute the identical expression
    tree in the identical order).

    Scale: the test×candidate join keys on the relation, which is
    heavily skewed (a handful of predicates carry most triples), so the
    small test side takes a deterministic salt and the candidate side is
    replicated ``salt_buckets``× — the join key becomes (rel, salt) and
    one hot relation spreads over ``salt_buckets`` partitions. Salting
    never changes the result set, only the partitioning, so the SQL
    oracle can ignore it. The per-test-triple rank is one
    map-side-combinable aggregate."""
    sr = [
        (ent_emb(F.col("subj"), j) * rel_emb(F.col("rel"), j)).alias(
            f"sr{j}"
        )
        for j in range(dim)
    ]
    s_true = sum(
        (ent_emb(F.col("subj"), j) * rel_emb(F.col("rel"), j))
        * ent_emb(F.col("obj"), j)
        for j in range(dim)
    ).alias("s_true")
    t = test.select(
        "subj",
        "rel",
        "obj",
        *sr,
        s_true,
        F.pmod(F.hash("subj", "obj"), F.lit(salt_buckets)).alias("salt"),
    )
    c = candidates.select(
        "rel",
        F.col("cand"),
        *[ent_emb(F.col("cand"), j).alias(f"ec{j}") for j in range(dim)],
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1))
        ).alias("salt"),
    )
    s_cand = sum(F.col(f"sr{j}") * F.col(f"ec{j}") for j in range(dim))
    beats = (
        (s_cand > F.col("s_true"))
        | ((s_cand == F.col("s_true")) & (F.col("cand") < F.col("obj")))
    ).cast("long")
    ranks = (
        t.join(c, ["rel", "salt"])
        .groupBy("subj", "rel", "obj")
        .agg((F.lit(1) + F.sum(beats)).alias("rnk"))
    )
    in_k = lambda k: F.when(F.col("rnk") <= k, 1.0).otherwise(0.0)  # noqa: E731
    return ranks.groupBy("rel").agg(
        F.count("*").alias("n_test"),
        F.round(F.avg(in_k(1)), 6).alias("hits1"),
        F.round(F.avg(in_k(10)), 6).alias("hits10"),
        F.round(F.avg(F.lit(1.0) / F.col("rnk")), 6).alias("mrr"),
    )


def subclass_closure(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Transitive closure of ``subClassOf`` edges ``(child, anc)`` by
    path DOUBLING: after round k every path of length ≤ 2^(k+1) is
    present, so ``rounds = ceil(log2(max_depth))`` — an ontology 1000
    levels deep needs 10 self-joins, not 1000 driver iterations. The
    ontology is tiny next to the instance data; each round is one
    equi-join + distinct over it."""
    c = edges.select("child", "anc").distinct()
    for _ in range(rounds):
        step = (
            c.alias("a")
            .join(c.alias("b"), F.col("a.anc") == F.col("b.child"))
            .select(F.col("a.child").alias("child"), F.col("b.anc").alias("anc"))
        )
        c = c.unionByName(step).distinct()
    return c


def type_extension(
    edges: DataFrame, typing: DataFrame, rounds: int = 2
) -> DataFrame:
    """RDFS entailment counts: for every type node, the number of proper
    descendant types (``n_subtypes``), directly-asserted instances
    (``n_direct``), and instances in the INFERRED extension — direct or
    typed under any descendant (``n_inferred``; rdfs:subClassOf +
    rdf:type closure).

    ``typing(instance_id, type_id)`` is the big side and is touched by
    exactly one broadcast join against the (tiny, reflexive-extended)
    closure, then one type-keyed aggregate — no instance self-join ever
    happens."""
    clo = subclass_closure(edges, rounds=rounds)
    nodes = (
        clo.select(F.col("child").alias("type_id"))
        .unionByName(clo.select(F.col("anc").alias("type_id")))
        .distinct()
    )
    refl = clo.unionByName(
        nodes.select(
            F.col("type_id").alias("child"), F.col("type_id").alias("anc")
        )
    )
    ext = (
        typing.join(
            F.broadcast(refl), typing["type_id"] == refl["child"]
        )
        .groupBy("anc")
        .agg(F.countDistinct("instance_id").alias("n_inferred"))
        .select(F.col("anc").alias("type_id"), "n_inferred")
    )
    subs = (
        clo.groupBy("anc")
        .agg(F.countDistinct("child").alias("n_subtypes"))
        .select(F.col("anc").alias("type_id"), "n_subtypes")
    )
    direct = typing.groupBy("type_id").agg(F.count("*").alias("n_direct"))
    return (
        nodes.join(subs, "type_id", "left")
        .join(direct, "type_id", "left")
        .join(ext, "type_id", "left")
        .select(
            "type_id",
            F.coalesce("n_subtypes", F.lit(0)).alias("n_subtypes"),
            F.coalesce("n_direct", F.lit(0)).alias("n_direct"),
            F.coalesce("n_inferred", F.lit(0)).alias("n_inferred"),
        )
    )


def hash_embedding(prefix: str):
    """Deterministic dense embedding component factory: md5 of
    ``prefix|node:j`` through the shared ascii-arithmetic hash, mapped
    to [-1, 1] in steps of 1/1000 — engine-identical in Spark and
    DuckDB, so hash-initialized parameters never need a join and SQL
    oracles can recompute them in place."""

    def emb(col, j):
        m = F.md5(
            F.concat(F.lit(prefix + "|"), col.cast("string"), F.lit(f":{j}"))
        )
        h = (
            F.ascii(F.substring(m, 1, 1)) * 16384
            + F.ascii(F.substring(m, 2, 1)) * 128
            + F.ascii(F.substring(m, 3, 1))
        )
        return ((h % 2001) - 1000) / F.lit(1000.0)

    return emb


def _sgns_pairs(pos_pairs: DataFrame, neg_pairs: DataFrame) -> DataFrame:
    """Positives (weight = multiplicity, label 1) ∪ negatives (weight 1,
    label 0) — the example stream both epoch forms share."""
    return pos_pairs.select(
        "center",
        "context",
        F.col("n_pairs").cast("double").alias("w"),
        F.lit(1.0).alias("y"),
    ).unionByName(
        neg_pairs.select(
            "center", "context", F.lit(1.0).alias("w"), F.lit(0.0).alias("y")
        )
    )


def _sgns_grad_update(ex: DataFrame, ei, eo, dim: int, lr: float) -> DataFrame:
    """Shared gradient core: fast-sigmoid link, weighted batch gradient,
    10^9-quantized integer sum per (side, node, j), one de-quantized
    update. ``ei``/``eo`` are the per-dimension center/context embedding
    Columns evaluated against ``ex``'s rows.

    The embedding expressions are projected to named columns FIRST and
    the gradient arms reference only those attributes: each emb column
    feeds the score plus two gradient arms, and in the hash-init path
    the expression is an md5 tree — Catalyst's CollapseProject keeps the
    boundary for non-cheap multiply-referenced expressions, so every
    md5 evaluates once per row instead of once per struct arm (measured
    3.5x on the sf0.01 epoch)."""
    ex = ex.select(
        "center",
        "context",
        "w",
        "y",
        *[ei[j].alias(f"_ei{j}") for j in range(dim)],
        *[eo[j].alias(f"_eo{j}") for j in range(dim)],
    )
    ei = [F.col(f"_ei{j}") for j in range(dim)]
    eo = [F.col(f"_eo{j}") for j in range(dim)]
    s = ei[0] * eo[0]
    for j in range(1, dim):
        s = s + ei[j] * eo[j]
    sig = F.lit(0.5) + (F.lit(0.5) * s) / (F.lit(1.0) + F.abs(s))
    err = (sig - F.col("y")) * F.col("w")

    def q(g):
        return F.round(g * F.lit(1e9)).cast("long")

    rows = []
    for j in range(dim):
        rows.append(
            F.struct(
                F.lit("in").alias("side"),
                F.col("center").alias("node"),
                F.lit(j).alias("j"),
                q(err * eo[j]).alias("gq"),
                ei[j].alias("init"),
            )
        )
        rows.append(
            F.struct(
                F.lit("out").alias("side"),
                F.col("context").alias("node"),
                F.lit(j).alias("j"),
                q(err * ei[j]).alias("gq"),
                eo[j].alias("init"),
            )
        )
    g = ex.select(F.inline(F.array(*rows)))
    return (
        g.groupBy("side", "node", "j")
        .agg(F.sum("gq").alias("gq"), F.max("init").alias("init"))
        .select(
            "side",
            "node",
            "j",
            F.round(
                F.col("init")
                - F.lit(lr) * (F.col("gq").cast("double") / F.lit(1e9)),
                9,
            ).alias("emb"),
        )
    )


def skipgram_epoch(
    pos_pairs: DataFrame,
    neg_pairs: DataFrame,
    emb_in,
    emb_out,
    dim: int = 4,
    lr: float = 0.05,
) -> DataFrame:
    """ONE exact full-batch epoch of skip-gram-with-negative-sampling
    over KG walk pairs — the training step between the walk corpus
    (``graph.py::random_walks`` → pairs → negatives) and
    :func:`link_prediction_eval`.

    Semantics (deliberately chosen so a distributed run is bit-exact
    and SQL-oracle-checkable):

    * score s = Σ_j in(center)_j · out(context)_j; the link is the
      rational "fast sigmoid" σ̂(s) = 0.5 + (0.5·s)/(1+|s|) (Elliott
      activation) — same shape/gradient direction as the logistic link
      but pure +,·,/,abs arithmetic, which IEEE 754 rounds identically
      on every engine, unlike exp() whose libm differs by ULPs between
      JVM and C.
    * full-BATCH gradient descent, not SGD: every pair's gradient is
      computed against the epoch-start embeddings, then summed. SGD's
      sequential dependence cannot be reproduced by a shuffle-order-
      free engine; batch GD is order-independent by construction.
    * per-pair gradient components are quantized to
      ``round(g·10^9)`` BIGINTs before the sum, so the one aggregation
      is integer-exact across partitionings (same trick as
      :func:`truth_discovery`); the update de-quantizes once.
    * positives carry their multiplicity ``n_pairs`` as the gradient
      weight; negatives weigh 1 with label 0.

    Output: the touched half of both parameter tables —
    ``(side 'in'|'out', node, j, emb)`` after the update, 9 dp. Epoch 1
    needs NO parameter join at all: initial embeddings are pure
    hash functions of the node id (caller-supplied ``emb_in(col, j)`` /
    ``emb_out(col, j)`` Column factories), so the gradient pass is
    row-local over the pairs and the ONLY exchange is the final
    (side, node, j) integer sum — map-side combinable, skew-free (a
    hub node's gradient rows partial-aggregate inside each task).
    Later epochs read the materialized table back through
    :func:`skipgram_epoch_from_table`, whose two parameter joins are
    node-keyed equi-joins (the parameter-server pattern as Spark
    joins)."""
    ex = _sgns_pairs(pos_pairs, neg_pairs)
    ei = [emb_in(F.col("center"), j) for j in range(dim)]
    eo = [emb_out(F.col("context"), j) for j in range(dim)]
    return _sgns_grad_update(ex, ei, eo, dim, lr)


def skipgram_epoch_from_table(
    pos_pairs: DataFrame,
    neg_pairs: DataFrame,
    emb: DataFrame,
    dim: int = 4,
    lr: float = 0.05,
) -> DataFrame:
    """The iterative form of :func:`skipgram_epoch`: parameters come
    from a materialized ``(side, node, j, emb)`` table (a previous
    epoch's output) instead of hash init. Missing parameters default to
    0.0 — a node the table has never seen contributes nothing and takes
    the full gradient step from zero.

    Shape: the long table pivots to one wide row per (side, node) —
    ``max(when(j=k))`` over the node exchange — then TWO node-keyed
    equi-joins attach in(center) and out(context) rows to the pairs.
    This is the parameter-server read expressed as joins: at 10^12
    nodes both sides hash-partition on the node id, no broadcast, no
    driver state. The rest (fast-sigmoid, weighted batch gradient,
    10^9 quantization, one integer-sum exchange) is identical to
    epoch 1, and `tests/test_kgq.py` pins that running THIS function
    over the hash-init table reproduces :func:`skipgram_epoch`
    exactly."""
    def wide(side, prefix):
        agg = [
            F.max(F.when(F.col("j") == j, F.col("emb"))).alias(f"{prefix}{j}")
            for j in range(dim)
        ]
        return emb.where(F.col("side") == side).groupBy("node").agg(*agg)

    ex = (
        _sgns_pairs(pos_pairs, neg_pairs)
        .join(wide("in", "ei"), F.col("center") == F.col("node"), "left")
        .drop("node")
        .join(wide("out", "eo"), F.col("context") == F.col("node"), "left")
        .drop("node")
    )
    ei = [F.coalesce(F.col(f"ei{j}"), F.lit(0.0)) for j in range(dim)]
    eo = [F.coalesce(F.col(f"eo{j}"), F.lit(0.0)) for j in range(dim)]
    return _sgns_grad_update(ex, ei, eo, dim, lr)


def link_prediction_eval_from_table(
    test: DataFrame,
    candidates: DataFrame,
    emb: DataFrame,
    dim: int = 4,
    salt_buckets: int = 8,
    suffix: str = "",
) -> DataFrame:
    """:func:`link_prediction_eval` over a MATERIALIZED embedding table
    ``(side, node, j, emb)`` (e.g. a :func:`skipgram_epoch` output)
    instead of hash-function embeddings, scoring by the skip-gram
    inner product in(subj)·out(cand). Missing parameters score 0.0 —
    same convention as :func:`skipgram_epoch_from_table`. Metric
    columns take ``suffix`` so a trained arm and a baseline arm can be
    joined side by side. Scale shape: the long table pivots wide on one
    node exchange, the three parameter attachments are node-keyed
    equi-joins, and the skewed rel-keyed candidate join is salted
    exactly as the hash-embedding form."""
    def wide(side, prefix):
        agg = [
            F.max(F.when(F.col("j") == j, F.col("emb"))).alias(f"{prefix}{j}")
            for j in range(dim)
        ]
        return emb.where(F.col("side") == side).groupBy("node").agg(*agg)

    win = wide("in", "i")
    wout = wide("out", "o")
    tob = wout.select(
        F.col("node").alias("_tn"),
        *[F.col(f"o{j}").alias(f"t{j}") for j in range(dim)],
    )
    ei = [F.coalesce(F.col(f"i{j}"), F.lit(0.0)) for j in range(dim)]
    to = [F.coalesce(F.col(f"t{j}"), F.lit(0.0)) for j in range(dim)]
    s_true = ei[0] * to[0]
    for j in range(1, dim):
        s_true = s_true + ei[j] * to[j]
    t = (
        test.join(win, test["subj"] == win["node"], "left")
        .drop("node")
        .join(tob, F.col("obj") == F.col("_tn"), "left")
        .drop("_tn")
        .select(
            "subj",
            "rel",
            "obj",
            *[F.col(f"i{j}") for j in range(dim)],
            s_true.alias("s_true"),
            F.pmod(F.hash("subj", "obj"), F.lit(salt_buckets)).alias("salt"),
        )
    )
    c = (
        candidates.join(wout, candidates["cand"] == wout["node"], "left")
        .drop("node")
        .select(
            "rel",
            "cand",
            *[
                F.coalesce(F.col(f"o{j}"), F.lit(0.0)).alias(f"o{j}")
                for j in range(dim)
            ],
            F.explode(
                F.sequence(F.lit(0), F.lit(salt_buckets - 1))
            ).alias("salt"),
        )
    )
    s_cand = F.coalesce(F.col("i0"), F.lit(0.0)) * F.col("o0")
    for j in range(1, dim):
        s_cand = s_cand + F.coalesce(F.col(f"i{j}"), F.lit(0.0)) * F.col(
            f"o{j}"
        )
    beats = (
        (s_cand > F.col("s_true"))
        | ((s_cand == F.col("s_true")) & (F.col("cand") < F.col("obj")))
    ).cast("long")
    ranks = (
        t.join(c, ["rel", "salt"])
        .groupBy("subj", "rel", "obj")
        .agg((F.lit(1) + F.sum(beats)).alias("rnk"))
    )
    in_k = lambda k: F.when(F.col("rnk") <= k, 1.0).otherwise(0.0)  # noqa: E731
    return ranks.groupBy("rel").agg(
        F.count("*").alias("n_test"),
        F.round(F.avg(in_k(1)), 6).alias(f"hits1{suffix}"),
        F.round(F.avg(in_k(10)), 6).alias(f"hits10{suffix}"),
        F.round(F.avg(F.lit(1.0) / F.col("rnk")), 6).alias(f"mrr{suffix}"),
    )
