"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship link-graph pipeline on sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2 +
                  training-data-pipeline additions).
``oracle_sql()``— DuckDB-equivalent ANSI SQL per query (omitted only for
                  genuinely non-SQL-expressible iterative ops, which the
                  driver then row-count-checks; those are additionally
                  golden-tested in tests/).

Graph inputs are derived deterministically from the driver tables so both
engines see identical edges:
  * CP — co-purchase graph over parts: parts sharing an order, canonical
    (src < dst, distinct).  Dense: ~2000 vertices / ~116k edges at sf0.01.
  * EV — event-succession forest: consecutive events of the same
    (user_id, day) ordered by (ts, event_id).  Sparse path components —
    the connected-components / label-propagation fixture.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared inputs
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.least("a.l_partkey", "b.l_partkey").alias("src"),
            F.greatest("a.l_partkey", "b.l_partkey").alias("dst"),
        )
        .distinct()
    )


def event_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").alias("day"), "ts"
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    chain = ev.select(
        F.col("event_id").alias("src"),
        F.lead("event_id").over(w).alias("dst"),
    )
    return chain.filter(F.col("dst").isNotNull())


# CP_SMALL — co-purchase subgraph with both endpoints <= 500: the fixture
# for the O(VE)-ish exact operators (betweenness, trusses, eigencentrality)
CP_SMALL_MAX = 500


def cp_small_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = copurchase_edges(spark, sf_dir)
    return e.filter(
        (F.col("src") <= CP_SMALL_MAX) & (F.col("dst") <= CP_SMALL_MAX)
    )


def wcp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted co-purchase subgraph: weight = number of distinct orders
    containing both parts (both endpoints <= 500)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .filter(
            (F.col("a.l_partkey") <= CP_SMALL_MAX)
            & (F.col("b.l_partkey") <= CP_SMALL_MAX)
        )
        .groupBy(
            F.least("a.l_partkey", "b.l_partkey").alias("src"),
            F.greatest("a.l_partkey", "b.l_partkey").alias("dst"),
        )
        .agg(
            F.count_distinct(F.col("a.l_orderkey")).cast("double").alias("weight")
        )
    )


def event_cyc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed digraph fixture with non-trivial SCC structure: the event
    chains, plus a back-edge (last -> first event) per (user, day) chain
    of length >= 2 for EVEN user ids — even-user chains become cycles
    (one SCC each), odd-user chains stay paths (singleton SCCs)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").alias("day"), "ts"
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id", "day")
    o = ev.select(
        "event_id", "user_id", "day",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("c"),
    )
    fwd = event_chain_edges(spark, sf_dir)
    last = o.filter(
        (F.col("rn") == F.col("c"))
        & (F.col("c") >= 2)
        & (F.pmod("user_id", F.lit(2)) == 0)
    ).select("user_id", "day", F.col("event_id").alias("src"))
    first = o.filter(F.col("rn") == 1).select(
        "user_id", "day", F.col("event_id").alias("dst")
    )
    back = last.join(first, ["user_id", "day"]).select("src", "dst")
    return fwd.union(back)


def event_dag_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diamond-laden DAG fixture: per-(user, day) event chains with
    skip-1 AND skip-2 succession edges — every interior chain vertex has
    in-degree 2, so Kahn layering exercises real merge bookkeeping;
    depth = max chain length (~10 at sf0.01)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").alias("day"), "ts"
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    legs = [
        ev.select(
            F.col("event_id").alias("src"),
            F.lead("event_id", k).over(w).alias("dst"),
        )
        for k in (1, 2)
    ]
    return legs[0].union(legs[1]).filter(F.col("dst").isNotNull())


def user_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(graph_id, src, dst): each user's in-day event-succession graph."""
    edges = event_chain_edges(spark, sf_dir)
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("src"), F.col("user_id").alias("graph_id")
    )
    return edges.join(ev, "src").select("graph_id", "src", "dst")


def user_cyclic_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(graph_id, src, dst): in-day succession chain UNION in-day
    same-type succession — the type chords put cycles over the chains,
    so per-user biconnectivity (cut vertices / bridges) is non-trivial."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").alias("day"),
        "ts", "event_type",
    )
    w1 = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    w2 = Window.partitionBy("user_id", "day", "event_type").orderBy(
        "ts", "event_id"
    )
    legs = [
        ev.select(
            F.col("user_id").alias("graph_id"),
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        for w in (w1, w2)
    ]
    return legs[0].union(legs[1]).filter(F.col("dst").isNotNull())


def user_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(graph_id, src, dst, weight): weight = seconds between the two
    events of each succession edge."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").alias("day"), "ts"
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    chain = ev.select(
        F.col("user_id").alias("graph_id"),
        F.col("event_id").alias("src"),
        F.lead("event_id").over(w).alias("dst"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("sts"),
        F.lead(F.unix_millis(F.col("ts").cast("timestamp"))).over(w).alias("dts"),
    )
    return chain.filter(F.col("dst").isNotNull()).select(
        "graph_id", "src", "dst",
        ((F.col("dts") - F.col("sts")) / 1000.0).alias("weight"),
    )


_CP_SQL = """
edges AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
                  greatest(a.l_partkey, b.l_partkey) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM sym),
deg AS (SELECT src AS v, count(*) AS degree FROM sym GROUP BY src)
"""

_EV_SQL = """
ev AS (
  SELECT event_id, user_id, date_trunc('day', ts) AS day, ts FROM events
),
chain AS (
  SELECT event_id AS src,
         lead(event_id) OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS dst
  FROM ev
),
edges AS (SELECT src, dst FROM chain WHERE dst IS NOT NULL),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM sym)
"""

_TRI_SQL = """
oriented AS (
  SELECT CASE WHEN (da.degree, e.src) < (db.degree, e.dst) THEN e.src ELSE e.dst END AS a,
         CASE WHEN (da.degree, e.src) < (db.degree, e.dst) THEN e.dst ELSE e.src END AS b
  FROM edges e JOIN deg da ON e.src = da.v JOIN deg db ON e.dst = db.v
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN edges c ON c.src = least(e1.b, e2.b) AND c.dst = greatest(e1.b, e2.b)
),
tri_per_v AS (
  SELECT v, count(*) AS triangles FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY v
)
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: co-purchase link graph on sf0.001 -> per-vertex summary
    (degree, component, 5-iteration PageRank), top 100 by pagerank."""
    from dachshund_spark.operators.builders import symmetrized
    from dachshund_spark.operators.components import connected_components
    from dachshund_spark.operators.pagerank import pagerank
    from dachshund_spark.operators.builders import degrees

    sf_dir = "/root/testdata/sf0.001"
    edges = copurchase_edges(spark, sf_dir).persist()
    edges.count()
    deg = degrees(edges)
    cc = connected_components(edges)
    pr = pagerank(symmetrized(edges), tol=0.0, max_iter=5)
    out = (
        deg.join(cc, "v")
        .join(pr, "v")
        .select("v", "degree", "component", F.round("pagerank", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("v"))
        .limit(100)
    )
    return out


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_degree(spark, sf_dir):
    from dachshund_spark.operators.builders import degrees

    return degrees(copurchase_edges(spark, sf_dir))


def _q_degree_distribution(spark, sf_dir):
    from dachshund_spark.operators.builders import degrees

    return (
        degrees(copurchase_edges(spark, sf_dir))
        .groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
    )


def _q_top_degree(spark, sf_dir):
    from dachshund_spark.operators.builders import degrees

    d = degrees(copurchase_edges(spark, sf_dir))
    w = Window.orderBy(F.desc("degree"), F.asc("v"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("v", "degree", "rank")
    )


def _q_triangles(spark, sf_dir):
    from dachshund_spark.operators.triangles import triangle_counts

    return triangle_counts(copurchase_edges(spark, sf_dir))


def _q_transitivity(spark, sf_dir):
    from dachshund_spark.operators.triangles import global_stats

    s = global_stats(copurchase_edges(spark, sf_dir))
    return spark.createDataFrame(
        [
            (
                s["vertices"],
                s["edges"],
                s["triangles"],
                round(s["transitivity"], 6),
                round(s["avg_clustering"], 6),
            )
        ],
        "n_vertices long, n_edges long, n_triangles long, transitivity double,"
        " avg_clustering double",
    )


def _q_clustering(spark, sf_dir):
    from dachshund_spark.operators.triangles import clustering_coefficients

    return clustering_coefficients(copurchase_edges(spark, sf_dir)).select(
        "v", "degree", F.round("coefficient", 6).alias("coefficient")
    )


def _q_cc_paths(spark, sf_dir):
    from dachshund_spark.operators.components import connected_components

    return connected_components(event_chain_edges(spark, sf_dir), max_iter=50)


def _q_cc_discovery_order(spark, sf_dir):
    # to_discovery_order's two-pass distributed dense rank (range
    # partitions + per-partition offsets — no global single-reducer
    # window), hash-checked against SQL dense_rank
    from dachshund_spark.operators.components import (
        connected_components,
        to_discovery_order,
    )

    cc = connected_components(event_chain_edges(spark, sf_dir), max_iter=50)
    return to_discovery_order(cc)


def _q_cc_giant(spark, sf_dir):
    from dachshund_spark.operators.components import connected_components

    return connected_components(copurchase_edges(spark, sf_dir), max_iter=50)


def _q_pagerank(spark, sf_dir):
    from dachshund_spark.operators.builders import symmetrized
    from dachshund_spark.operators.pagerank import pagerank

    pr = pagerank(
        symmetrized(copurchase_edges(spark, sf_dir)), tol=0.0, max_iter=5, impl="sql"
    )
    return pr.select("v", F.round("pagerank", 6).alias("pagerank"))


def _q_pagerank_csr(spark, sf_dir):
    from dachshund_spark.operators.builders import symmetrized
    from dachshund_spark.operators.pagerank import pagerank

    pr = pagerank(
        symmetrized(copurchase_edges(spark, sf_dir)), tol=0.0, max_iter=5, impl="csr"
    )
    return pr.select("v", F.round("pagerank", 6).alias("pagerank"))


def _q_label_propagation(spark, sf_dir):
    from dachshund_spark.operators.label_propagation import label_propagation

    return label_propagation(event_chain_edges(spark, sf_dir), max_iter=2)


def _q_coreness(spark, sf_dir):
    # iterative peeling to fixpoint — hash-checked against the pure-python
    # kernel oracle (dachshund_spark.oracles.ora_coreness)
    from dachshund_spark.operators.coreness import coreness

    return coreness(copurchase_edges(spark, sf_dir))


def _q_k_core_components_k60(spark, sf_dir):
    from dachshund_spark.operators.coreness import k_core_components

    return k_core_components(copurchase_edges(spark, sf_dir), 60)


def _q_k_core_components_k80(spark, sf_dir):
    from dachshund_spark.operators.coreness import k_core_components

    return k_core_components(copurchase_edges(spark, sf_dir), 80)


def _q_k_truss_edges_k4(spark, sf_dir):
    from dachshund_spark.operators.coreness import k_truss_edges

    return k_truss_edges(cp_small_edges(spark, sf_dir), 4)


def _q_min_degree_prune_k16(spark, sf_dir):
    from dachshund_spark.operators.builders import min_degree_prune

    return min_degree_prune(cp_small_edges(spark, sf_dir), 16)


def _q_betweenness_sampled(spark, sf_dir):
    from dachshund_spark.operators.centrality import betweenness

    bet = betweenness(
        copurchase_edges(spark, sf_dir), max_sources=100, seed=0
    )
    return bet.select("v", F.round("betweenness", 6).alias("betweenness"))


def _q_betweenness_exact(spark, sf_dir):
    from dachshund_spark.operators.centrality import betweenness

    bet = betweenness(cp_small_edges(spark, sf_dir), max_sources=None)
    return bet.select("v", F.round("betweenness", 6).alias("betweenness"))


def _q_betweenness_superstep(spark, sf_dir):
    # the designated giant-graph fallback (all-sources-simultaneous
    # distributed Brandes supersteps; no per-task adjacency) on the SAME
    # sampled sources as graph_betweenness_sampled, hash-matched against
    # the same kernel oracle — proves the distributed path itself, not
    # just the task-parallel kernel, computes Brandes exactly
    from dachshund_spark.operators.centrality import betweenness_superstep

    bet = betweenness_superstep(
        copurchase_edges(spark, sf_dir), max_sources=100, seed=0
    )
    return bet.select("v", F.round("betweenness", 6).alias("betweenness"))


def _q_eigenvector_centrality(spark, sf_dir):
    from dachshund_spark.operators.centrality import eigenvector_centrality

    ev = eigenvector_centrality(
        cp_small_edges(spark, sf_dir), eps=0.0, max_iter=20
    )
    return ev.select("v", F.round("evcent", 6).alias("evcent"))


def _q_coreness_anomaly(spark, sf_dir):
    from dachshund_spark.operators.coreness import coreness_anomaly

    a = coreness_anomaly(copurchase_edges(spark, sf_dir))
    return a.select("v", F.round("anomaly", 6).alias("anomaly"))


def _q_weighted_coreness(spark, sf_dir):
    from dachshund_spark.operators.coreness import weighted_coreness

    wc = weighted_coreness(wcp_edges(spark, sf_dir))
    return wc.select("v", F.round("coreness", 6).alias("coreness"))


def _q_scc(spark, sf_dir):
    from dachshund_spark.operators.components import (
        strongly_connected_components,
    )

    return strongly_connected_components(
        event_cyc_edges(spark, sf_dir), max_outer=60
    )


def _q_wcc_digraph(spark, sf_dir):
    from dachshund_spark.operators.components import (
        weakly_connected_components,
    )

    return weakly_connected_components(
        event_cyc_edges(spark, sf_dir), max_iter=50
    )


def _q_is_acyclic(spark, sf_dir):
    from dachshund_spark.operators.components import is_acyclic

    rows = [
        ("event_chain", is_acyclic(event_chain_edges(spark, sf_dir))),
        ("event_chain_cyc", is_acyclic(event_cyc_edges(spark, sf_dir))),
    ]
    return spark.createDataFrame(rows, "graph string, acyclic boolean")


def _q_cc_twophase(spark, sf_dir):
    from dachshund_spark.operators.components import (
        connected_components_two_phase,
    )

    return connected_components_two_phase(event_chain_edges(spark, sf_dir))


def _q_shortest_path_dag(spark, sf_dir):
    from dachshund_spark.operators.builders import canonical_undirected
    from dachshund_spark.operators.paths import shortest_path_dag

    edges = canonical_undirected(cp_small_edges(spark, sf_dir))
    source = edges.agg(F.min("src")).collect()[0][0]
    return shortest_path_dag(edges, source)


def _q_core_assignments_per_user(spark, sf_dir):
    from dachshund_spark.operators.pergraph import core_assignments_per_graph

    return core_assignments_per_graph(user_graph_edges(spark, sf_dir))


def _q_kpeaks_per_user(spark, sf_dir):
    from dachshund_spark.operators.pergraph import kpeak_miner

    return kpeak_miner(user_graph_edges(spark, sf_dir))


def _q_cnm_per_user(spark, sf_dir):
    from dachshund_spark.operators.pergraph import cnm_communities_per_graph

    return cnm_communities_per_graph(user_graph_edges(spark, sf_dir))


def _q_brokerage_per_user(spark, sf_dir):
    from dachshund_spark.operators.pergraph import (
        ModMembership,
        brokerage_per_graph,
    )

    return brokerage_per_graph(
        user_graph_edges(spark, sf_dir), ModMembership(4)
    )


def _q_jp_coloring(spark, sf_dir):
    # Jones-Plassmann greedy coloring over the undirected page-link graph
    # (synthesize -> extract -> edges -> page-number ids); the fixed md5
    # priority makes the "randomized" algorithm hash-gateable.  The sparse
    # web graph keeps the JP dependency depth ~30-50 rounds (the dense
    # co-purchase graph is near-sequential: 200 vertices -> 104 rounds)
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.coloring import jp_coloring
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import (
        edges_from_extracted,
        synthesize_pages,
        url_dim,
    )

    n = host_graph_pages(sf_dir)
    pages = synthesize_pages(spark, n_pages=n, n_sites=53, n_hubs=16, seed=7)
    e = edges_from_extracted(extract(pages))
    dim = url_dim(pages).select(
        "v",
        F.regexp_extract("url", r"page(\d+)$", 1).cast("long").alias("page"),
    )
    e = (
        e.join(dim.select(F.col("v").alias("src"), F.col("page").alias("ps")), "src")
        .join(dim.select(F.col("v").alias("dst"), F.col("page").alias("pd")), "dst")
        .select(F.col("ps").alias("src"), F.col("pd").alias("dst"))
    )
    return jp_coloring(e, seed=0)


def _q_kmeans_assignments(spark, sf_dir):
    # distributed Lloyd's over EVERY embedding (the IVF queries train on
    # a driver-side sample; this is the full-corpus scale path) — exact
    # integer micro-unit arithmetic makes it hash-gateable
    from dachshund_spark.operators.kmeans import kmeans_lloyd

    return kmeans_lloyd(
        _t(spark, sf_dir, "embeddings"), k=8, iters=5, seed=0
    )


def _pii_fixture(spark, n):
    # deterministic PII-laced corpus: email on even ids, phone on i%3==0,
    # IPv4 on i%5==0 — pure concat/modulo arithmetic so the DuckDB oracle
    # regenerates the exact bytes (the url_dedup fixture discipline)
    i = F.col("id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.when(
        i % 2 == 0,
        F.concat(
            F.lit(" contact user"), s(i), F.lit("@mail"), s(i % 7),
            F.lit(".example for details"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        i % 3 == 0,
        F.concat(
            F.lit(" call 555-"), s(i % 900 + 100), F.lit("-"),
            s(i % 9000 + 1000), F.lit(" now"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        i % 5 == 0,
        F.concat(
            F.lit(" server 10."), s(i % 256), F.lit("."),
            s((i * 7) % 256), F.lit("."), s((i * 13) % 256), F.lit(" up"),
        ),
    ).otherwise(F.lit(""))
    return spark.range(0, n).select(
        i.alias("doc_id"),
        F.concat(F.lit("doc "), s(i), email, phone, ip).alias("text"),
    )


def _q_pii_redaction(spark, sf_dir):
    # PII scrub pass (emails/phones/IPv4 -> typed tags): pure codegen'd
    # regexp expressions, mapper-only, no shuffle — the pre-tokenization
    # scrub an LLM data pipeline runs over every document
    from dachshund_spark.functions.pii import pii_stats
    from dachshund_spark.oracles import host_graph_pages

    docs = _pii_fixture(spark, host_graph_pages(sf_dir))
    return pii_stats(docs)


def _q_line_dedup(spark, sf_dir):
    # line-level boilerplate removal (RefinedWeb/CCNet-style): site nav +
    # copyright lines and cross-site promo banners repeat across >=5 docs
    # and must be stripped; per-article body lines survive.  Zero UDFs —
    # the whole pass is explode/aggregate/join SQL
    from dachshund_spark.functions.linededup import line_dedup
    from dachshund_spark.oracles import host_graph_pages

    n = host_graph_pages(sf_dir)
    i = F.col("id")
    s = lambda c: c.cast("string")  # noqa: E731
    site = s(i % 53)
    docs = spark.range(0, n).select(
        i.alias("doc_id"),
        F.concat_ws(
            "\n",
            F.concat(F.lit("nav home about site"), site),
            F.concat(
                F.lit("article "), s(i), F.lit(" para one "),
                s((i * 7) % 1000),
            ),
            F.concat(
                F.lit("article "), s(i), F.lit(" para two "),
                s((i * 13) % 1000),
            ),
            F.when(
                i % 4 == 0,
                F.concat(F.lit("promo banner "), s(i % 11)),
            ),
            F.concat(F.lit("copyright site"), site),
        ).alias("text"),
    )
    return line_dedup(docs, min_docs=5)


def _q_spam_mass(spark, sf_dir):
    # relative spam mass (Gyongyi et al., "Link spam detection based on
    # mass estimation", VLDB'06): how much of a host's PageRank is NOT
    # backed by trusted seeds — (pr - trustrank) / pr over the weighted
    # host graph.  Composes the two gated rank queries; the ratio is
    # taken from the ROUNDED ranks so both engines divide identical
    # doubles (the anf nf discipline)
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.pagerank import pagerank
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import host_graph, synthesize_pages

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    hg = host_graph(extract(pages)).select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("links").alias("weight"),
    )
    hg = hg.persist()
    seeds = spark.createDataFrame(
        [(f"site{i}.test",) for i in range(16)], "v string"
    )
    pr = pagerank(hg, tol=0.0, max_iter=5, weight_col="weight")
    tr = pagerank(hg, tol=0.0, max_iter=5, weight_col="weight", teleport=seeds)
    j = (
        pr.select("v", F.round("pagerank", 6).alias("host_rank"))
        .join(tr.select("v", F.round("pagerank", 6).alias("trust_rank")), "v")
    )
    out = j.select(
        F.col("v").alias("host"),
        "host_rank",
        "trust_rank",
        # + 0.0 folds a possible -0.0 (round of a tiny negative mass)
        # to +0.0 on both sides — the signed-zero gate hazard
        (
            F.round(
                (F.col("host_rank") - F.col("trust_rank"))
                / F.col("host_rank"),
                6,
            )
            + F.lit(0.0)
        ).alias("rel_spam_mass"),
    )
    hg.unpersist()
    return out


def _q_value_percentiles(spark, sf_dir):
    # exact interpolated percentiles of the value column per event type
    # (Spark `percentile` == DuckDB `quantile_cont`: both are the linear
    # R-7 estimator, so the gate is exact after 6dp rounding)
    ev = _t(spark, sf_dir, "events")
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    aggs = [F.count("*").alias("n")] + [
        F.round(F.expr(f"percentile(value, {q})"), 6).alias(a)
        for a, q in qs.items()
    ]
    return ev.groupBy("event_type").agg(*aggs)


def _q_url_dedup(spark, sf_dir):
    # url-keyed dedup after syntax canonicalization (RFC 3986 §6 +
    # utm_* strip): deterministic variants of every page url — uppercased
    # scheme/host, :443 default port, #fragment, utm query params —
    # must collapse back onto the base url.  The whole pass is codegen'd
    # regexp expressions (functions/urls.py)
    from dachshund_spark.functions.urls import canonicalize_url
    from dachshund_spark.oracles import host_graph_pages

    n = host_graph_pages(sf_dir)
    base = spark.range(0, n).select(
        F.col("id"),
        F.concat(
            F.lit("https://site"),
            F.pmod("id", F.lit(53)).cast("string"),
            F.lit(".test/page"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    variants = base.select("url").unionAll(
        base.filter(F.col("id") % 2 == 0).select(
            F.concat(
                F.lit("HTTPS://SITE"),
                F.pmod("id", F.lit(53)).cast("string"),
                F.lit(".TEST/page"),
                F.col("id").cast("string"),
            ).alias("url")
        )
    ).unionAll(
        base.filter(F.col("id") % 3 == 0).select(
            F.concat("url", F.lit("?utm_source=feed&utm_campaign=sync"))
            .alias("url")
        )
    ).unionAll(
        base.filter(F.col("id") % 5 == 0).select(
            F.concat("url", F.lit("#section-"), F.col("id").cast("string"))
            .alias("url")
        )
    ).unionAll(
        base.filter(F.col("id") % 7 == 0).select(
            F.concat(
                F.lit("https://site"),
                F.pmod("id", F.lit(53)).cast("string"),
                F.lit(".test:443/page"),
                F.col("id").cast("string"),
            ).alias("url")
        )
    )
    return (
        variants.select(canonicalize_url("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_variants"))
    )


def _q_biconnectivity_per_user(spark, sf_dir):
    # articulation points + bridge incidence per user graph (Tarjan
    # lowlink kernel under applyInPandas); the cyclic fixture keeps both
    # signals non-degenerate
    from dachshund_spark.operators.pergraph import biconnectivity_per_graph

    return biconnectivity_per_graph(user_cyclic_edges(spark, sf_dir))


def _q_weighted_core_miner_per_user(spark, sf_dir):
    from dachshund_spark.operators.pergraph import weighted_core_miner

    return weighted_core_miner(user_weighted_edges(spark, sf_dir))


def _q_spectral_per_user(spark, sf_dir):
    from dachshund_spark.operators.pergraph import spectral_per_graph

    return spectral_per_graph(user_graph_edges(spark, sf_dir))


def _q_approx_stats_per_user(spark, sf_dir):
    # seeded wedge-sampling estimators + is_connected per user graph
    # (clustering.rs:50-80, transitivity.rs:56-91, connectivity.rs:48-63),
    # hash-checked against the kernel oracle
    from dachshund_spark.operators.pergraph import approx_stats_per_graph

    st = approx_stats_per_graph(user_graph_edges(spark, sf_dir))
    return st.select(
        "graph_id",
        "is_connected",
        F.round("approx_avg_clustering", 6).alias("approx_avg_clustering"),
        F.round("approx_transitivity", 6).alias("approx_transitivity"),
    )


def _q_ann_recall(spark, sf_dir):
    # Quality gate for the LSH-bucketed ANN path: recall@10 vs the exact
    # baseline, per query.  The fixture embeddings are isotropic random
    # vectors (top-10 cosines ~0.3), so hitting recall 1.0 requires wide
    # probing (3 planes x 16 tables ~ 87% candidate fraction here); on
    # real clustered corpora the same machinery prunes aggressively at
    # higher plane counts.  The gate checks the machinery + measurement.
    from dachshund_spark.functions.similarity import ann_recall

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ann_recall(emb, queries, k=10, n_planes=3, n_tables=16, seed=42)


def _q_ann_clustered(spark, sf_dir):
    # LSH pruning demonstrated on CLUSTERED data (the realistic corpus
    # shape): mixture-of-Gaussians fixture, recall@10 vs exact baseline
    # PLUS candidate fraction per query.  The scale win the operator
    # exists for: recall ~1.0 while examining <10% of the corpus
    # (cross-join collapses to bucket equi-join).  Thresholds are pinned
    # by tests/test_webtext_spark.py::test_ann_clustered_pruning.
    from dachshund_spark.functions.similarity import (
        ann_recall_stats,
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 2000, dim=32, n_clusters=50, sigma=0.05, seed=7
    ).persist()
    queries = emb.filter(F.col("vec_id") < 16)
    return ann_recall_stats(
        emb, queries, k=10, n_planes=10, n_tables=16, seed=42, dim=32
    )


def _q_media_frame_sample(spark, sf_dir):
    # REAL video metadata: variable-frame-count DIB AVI payloads, so the
    # duration-derived sampling plan has non-degenerate inputs; the plan
    # itself stays pure SQL over the meta struct (no decode)
    from dachshund_spark.functions.multimodal import (
        frame_sample_plan,
        synthesize_avi_media,
    )

    media = synthesize_avi_media(
        spark, 3000, seed=42, width=8, height=6, vary_frames=True
    )
    return frame_sample_plan(media, fps=2.0)


def _q_media_feature_stats(spark, sf_dir):
    # REAL codec path on a MIXED-format table: BMP + PNG images, PCM WAV
    # audio, DIB AVI video unioned with disjoint id ranges;
    # extract_features dispatches on each payload's magic bytes and the
    # feature is 8 chunk means over the genuinely decoded sample stream —
    # the oracle regenerates the content without the containers, so a
    # hash match proves all four encode -> decode round trips
    from dachshund_spark.functions.multimodal import (
        extract_features,
        synthesize_avi_media,
        synthesize_bmp_media,
        synthesize_png_media,
        synthesize_wav_media,
    )

    media = (
        synthesize_bmp_media(spark, 150, seed=42, start=0)
        .unionByName(synthesize_png_media(spark, 150, seed=42, start=150))
        .unionByName(synthesize_wav_media(spark, 100, seed=42, start=300))
        .unionByName(
            synthesize_avi_media(spark, 100, seed=42, n_frames=4, start=400)
        )
    )
    feats = extract_features(media, dim=8)
    mean = F.aggregate(
        F.col("feature").cast("array<double>"),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.lit(8.0)
    return feats.select(
        "media_id", "kind", F.round(mean, 5).alias("feat_mean")
    )


def _q_wav_features(spark, sf_dir):
    # REAL codec path: stdlib-encoded PCM WAV payloads decoded task-side
    # with the stdlib wave module; oracle regenerates the samples without
    # the container, so a hash match proves the round trip is lossless
    from dachshund_spark.functions.multimodal import (
        synthesize_wav_media,
        wav_feature_stats,
    )

    media = synthesize_wav_media(spark, 300, seed=42)
    st = wav_feature_stats(media)
    return st.select(
        "media_id",
        "n_samples",
        "sample_rate",
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        "zero_crossings",
    )


def _q_hub_salted_join(spark, sf_dir):
    # north_rule "explicit salted repartitioning for hub-vertex skew" as a
    # GATED equality: 60% of events collapse onto hub_key 0, the join runs
    # through plans.skew.salted_join (hub rows fan out over n_salt
    # reducers), and the oracle is the plain unsalted SQL join — a hash
    # match proves salting changes the physical plan, not the answer.
    # Weighted sums use exact integer arithmetic (value has 2 decimals,
    # weights are integers) so both engines agree bit-for-bit.
    from dachshund_spark.plans.skew import salted_join

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.when(F.col("event_id") % 10 < 6, F.lit(0))
            .otherwise(F.col("event_id") % 1000)
            .cast("long")
            .alias("hub_key"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("hub_key"),
        (F.col("id") * 7 % 13).cast("long").alias("w10"),
    )
    joined = salted_join(ev, dim, "hub_key", n_salt=8)
    return joined.groupBy("hub_key").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.col("value_cents") * F.col("w10")) / 1000.0).alias(
            "weighted_value"
        ),
    )


def _q_ivf_clustered(spark, sf_dir):
    # the IVF twin of emb_ann_clustered_pruning: coarse k-means cells
    # instead of hyperplane buckets; candidates come from an equi-join on
    # cell id, and the gate pins recall + candidate fraction against the
    # numpy mirror of the same quantizer
    from dachshund_spark.functions.similarity import (
        ivf_recall_stats,
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 2000, dim=32, n_clusters=50, sigma=0.05, seed=7
    ).persist()
    queries = emb.filter(F.col("vec_id") < 16)
    return ivf_recall_stats(
        emb, queries, k=10, n_centroids=50, n_probe=3, n_iters=10
    )


def _q_pq_codes(spark, sf_dir):
    # product quantization (Jegou et al., TPAMI 2011) over the clustered
    # fixture: driver-trained per-subspace codebooks, distributed Arrow
    # batch encoding; codes + reconstruction error pinned against the
    # numpy mirror of the same quantizer
    from dachshund_spark.functions.similarity import (
        pq_codes,
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 2000, dim=32, n_clusters=50, sigma=0.05, seed=7
    )
    return pq_codes(emb, m=4, k=16, n_iters=10)


def _q_pq_adc_topk(spark, sf_dir):
    # PQ asymmetric-distance search: integer micro-unit LUT lookups via a
    # broadcast equi-join over the exploded code table — no cross join,
    # no float in the scoring path; ranking pinned against the numpy
    # mirror of the same quantizer
    from dachshund_spark.functions.similarity import (
        pq_adc_topk,
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 2000, dim=32, n_clusters=50, sigma=0.05, seed=7
    ).persist()
    queries = emb.filter(F.col("vec_id") < 16)
    return pq_adc_topk(emb, queries, k_neighbors=10, m=4, k=16, n_iters=10)


def _q_image_features(spark, sf_dir):
    # REAL codec path: struct+numpy-encoded 24-bit BMP payloads decoded
    # task-side; oracle regenerates the pixels without the container, so
    # a hash match proves the round trip is lossless
    from dachshund_spark.functions.multimodal import (
        image_feature_stats,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(spark, 300, seed=42)
    st = image_feature_stats(media)
    return st.select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("luma_mean", 6).alias("luma_mean"),
        F.round("luma_std", 6).alias("luma_std"),
    )


def _q_video_features(spark, sf_dir):
    # REAL codec path: struct+numpy-encoded uncompressed DIB AVI payloads
    # decoded task-side by walking the RIFF chunks; oracle regenerates
    # the frames without the container
    from dachshund_spark.functions.multimodal import (
        synthesize_avi_media,
        video_feature_stats,
    )

    media = synthesize_avi_media(spark, 200, seed=42)
    st = video_feature_stats(media)
    return st.select(
        "media_id",
        "n_frames",
        "width",
        "height",
        F.round("luma_mean", 6).alias("luma_mean"),
        F.round("motion", 6).alias("motion"),
    )


def _q_bfs(spark, sf_dir):
    from dachshund_spark.operators.builders import canonical_undirected
    from dachshund_spark.operators.paths import undirected_bfs_distances

    edges = canonical_undirected(copurchase_edges(spark, sf_dir))
    source = edges.agg(F.min("src")).collect()[0][0]
    return undirected_bfs_distances(edges, source)


def _q_token_counts(spark, sf_dir):
    from dachshund_spark.functions.textops import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def _q_unigram_surprisal(spark, sf_dir):
    # corpus-unigram-LM quality proxy: per-doc quantized surprisal in
    # whole bits — exact integer arithmetic end to end (floor-log2 via
    # binary string length), no libm, no float accumulation order
    from dachshund_spark.functions.textops import unigram_surprisal

    return unigram_surprisal(_t(spark, sf_dir, "documents"))


def _q_adamic_adar(spark, sf_dir):
    # link prediction on the small copurchase subgraph (same fixture as
    # the O(deg^2)-frontier exact operators): distance-2 non-edges with
    # >= 2 common neighbors, Adamic-Adar scored
    from dachshund_spark.operators.linkpred import adamic_adar

    return adamic_adar(cp_small_edges(spark, sf_dir), min_common=2)


def _q_mst_forest(spark, sf_dir):
    # unique minimum spanning forest of the weighted copurchase subgraph
    # under the (weight, src, dst) total order — distributed Boruvka vs
    # the sequential Kruskal oracle
    from dachshund_spark.operators.mst import minimum_spanning_forest

    return minimum_spanning_forest(wcp_edges(spark, sf_dir))


def _q_topo_levels(spark, sf_dir):
    # Kahn topological layering of the event diamond DAG (level =
    # longest-path distance from the DAG's sources)
    from dachshund_spark.operators.dag import topological_levels

    return topological_levels(event_dag_edges(spark, sf_dir))


def _q_random_walks(spark, sf_dir):
    # deterministic DeepWalk-style corpus: 2 walks x 4 steps per vertex
    # of the small copurchase subgraph, md5-derived neighbor picks
    from dachshund_spark.operators.walks import random_walks

    return random_walks(
        cp_small_edges(spark, sf_dir), walks_per_vertex=2, length=4, seed=0
    )


def _q_trussness(spark, sf_dir):
    # full truss decomposition (max k per edge) of the small copurchase
    # subgraph — the truss analog of graph_coreness
    from dachshund_spark.operators.coreness import trussness

    return trussness(cp_small_edges(spark, sf_dir))


def _q_sssp_weighted(spark, sf_dir):
    # weighted SSSP (frontier Bellman-Ford supersteps) on the weighted
    # copurchase subgraph from its minimum vertex id; integer-valued
    # weights => exact distances, hash-gateable
    from dachshund_spark.operators.sssp import weighted_sssp

    w = wcp_edges(spark, sf_dir)
    sym = w.union(
        w.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    source = w.agg(F.min("src")).collect()[0][0]
    return weighted_sssp(sym, source)


def _q_butterfly_topk(spark, sf_dir):
    # bipartite butterfly (K2,2) counts per part over the order/part
    # incidence (parts <= 500), deterministic top-20 head
    from dachshund_spark.operators.butterflies import butterfly_per_vertex

    inc = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") <= CP_SMALL_MAX
    )
    return butterfly_per_vertex(
        inc, pivot="l_orderkey", side="l_partkey", top_k=20
    )


def _q_node2vec_walks(spark, sf_dir):
    # second-order biased walks (node2vec p=2, q=0.5) on the small
    # copurchase subgraph — inverse-CDF md5 picks => hash-gateable
    from dachshund_spark.operators.walks import node2vec_walks

    return node2vec_walks(
        cp_small_edges(spark, sf_dir),
        walks_per_vertex=1, length=4, p=2.0, q=0.5, seed=0,
    )


def _q_user_sample(spark, sf_dir):
    # deterministic per-user event sample (k=5): md5-ranked
    # uniform-without-replacement, reproducible across engines/retries
    from dachshund_spark.functions.sampling import deterministic_sample

    ev = _t(spark, sf_dir, "events")
    return deterministic_sample(
        ev, ["user_id"], "event_id", k=5, seed=7
    ).select("user_id", "event_id", "sample_rank")


def _q_double_sweep(spark, sf_dir):
    # Magnien-Latapy-Habib double sweep: diameter lower bound of the
    # small copurchase subgraph in exactly two BFS passes
    from dachshund_spark.operators.paths import double_sweep_diameter

    return double_sweep_diameter(cp_small_edges(spark, sf_dir))


def _q_maximal_matching(spark, sf_dir):
    # greedy maximal matching of the small copurchase subgraph under the
    # static md5 edge order — the distributed local-minima rounds equal a
    # sequential greedy scan, so the matching is value-hash-gated
    from dachshund_spark.operators.matching import greedy_matching

    return greedy_matching(cp_small_edges(spark, sf_dir))


def _q_louvain_moves(spark, sf_dir):
    # Louvain phase-1 (synchronous modularity-gain label moves) over the
    # full copurchase graph — exact integer gain keys, so even this
    # heuristic is value-hash-gated against the sequential kernel
    from dachshund_spark.operators.louvain import louvain_moves

    return louvain_moves(copurchase_edges(spark, sf_dir), max_rounds=6)


def _q_louvain_modularity(spark, sf_dir):
    # exact-integer Newman modularity of the Louvain labels: Q as
    # q_num/q_den BIGINTs plus the single-division float — the quality
    # readout that makes the heuristic's output auditable
    from dachshund_spark.operators.louvain import louvain_moves, modularity

    edges = copurchase_edges(spark, sf_dir)
    return modularity(edges, louvain_moves(edges, max_rounds=6))


def _q_luby_mis(spark, sf_dir):
    # Luby maximal independent set of the full copurchase graph —
    # deterministic md5 per-round priorities, so even this "randomized"
    # symmetry-breaking primitive is value-hash-gated (members + round)
    from dachshund_spark.operators.mis import luby_mis

    return luby_mis(copurchase_edges(spark, sf_dir), seed=0)


def _q_gopher_repetition(spark, sf_dir):
    from dachshund_spark.functions.textops import gopher_repetition

    return gopher_repetition(_t(spark, sf_dir, "documents"))


def _q_tfidf_top5(spark, sf_dir):
    from dachshund_spark.functions.textops import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


def _q_top_bigrams(spark, sf_dir):
    from dachshund_spark.functions.textops import top_ngrams

    return top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=20)


def _q_quality(spark, sf_dir):
    from dachshund_spark.functions.textops import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def _q_lang_id(spark, sf_dir):
    from dachshund_spark.functions.textops import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _q_exact_dups(spark, sf_dir):
    from dachshund_spark.functions.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf_dir, "documents"))


def _q_dedup_clusters(spark, sf_dir):
    # composite pipeline stage: near-duplicate CLUSTERING — banded-MinHash
    # candidate pairs become an undirected graph whose connected components
    # are the duplicate clusters (rep = min doc_id, the hash-min LP
    # contract); the standard reduce step before keep-one-per-cluster.
    # Exercises the pipeline family feeding the graph engine in one plan.
    from dachshund_spark.functions.dedup import lsh_candidate_pairs
    from dachshund_spark.operators.components import connected_components

    pairs = lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), n=3, num_hashes=12, bands=4
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("v").alias("doc_id"),
        F.col("component").alias("cluster_rep"),
        "cluster_size",
    )


def _q_bpe_token_counts(spark, sf_dir):
    from dachshund_spark.functions.textops import bpe_token_counts

    return bpe_token_counts(_t(spark, sf_dir, "documents"))


def _q_winnow_fingerprints(spark, sf_dir):
    from dachshund_spark.functions.textops import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=8, window=4)


def _q_minhash_pairs(spark, sf_dir):
    from dachshund_spark.functions.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), n=3, num_hashes=12, bands=4
    )


def _q_jaccard_pairs(spark, sf_dir):
    from dachshund_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.4, block_col="lang"
    )


def _q_cosine_topk(spark, sf_dir):
    from dachshund_spark.functions.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=10)


def _q_simhash(spark, sf_dir):
    # JVM-side bit arithmetic with a full DuckDB SQL mirror (hash-checked)
    from dachshund_spark.functions.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents"))


def _q_featurizer_per_user(spark, sf_dir):
    # simple_graph_featurizer over each user's event-succession graph,
    # hash-checked against the kernel oracle
    from dachshund_spark.operators.pergraph import featurize

    return featurize(user_graph_edges(spark, sf_dir))


def _q_core_miner_per_user(spark, sf_dir):
    # core_miner output (coreness, degree, anomaly) per user graph,
    # hash-checked against the kernel oracle
    from dachshund_spark.operators.pergraph import core_miner

    return core_miner(user_graph_edges(spark, sf_dir))


def _q_clique_miner(spark, sf_dir):
    # beam-search quasi-biclique mining on the supplier-part bipartite
    # graph derived from lineitem (rows-only; kernel golden-tested)
    from dachshund_spark.functions.clique_kernel import SearchProblem
    from dachshund_spark.operators.clique_miner import mine_cliques

    li = _t(spark, sf_dir, "lineitem")
    typed = li.select(
        F.lit(0).cast("long").alias("graph_id"),
        F.col("l_suppkey").alias("core_id"),
        F.col("l_partkey").alias("non_core_id"),
        F.lit("supplies").alias("edge_type"),
        F.lit("part").alias("non_core_type"),
    ).distinct()
    sp = SearchProblem(
        beam_size=10, alpha=1.0, global_thresh=0.5, local_thresh=0.5,
        num_to_search=10, num_epochs=30, max_repeated_prior_scores=3,
        min_degree=2,
    )
    return mine_cliques(typed, [["supplier", "supplies", "part"]], sp)


def _q_clique_miner_long(spark, sf_dir):
    # same search, --long_format output: one row per clique node
    # (transformer.rs:291-307)
    from dachshund_spark.functions.clique_kernel import SearchProblem
    from dachshund_spark.operators.clique_miner import mine_cliques

    li = _t(spark, sf_dir, "lineitem")
    typed = li.select(
        F.lit(0).cast("long").alias("graph_id"),
        F.col("l_suppkey").alias("core_id"),
        F.col("l_partkey").alias("non_core_id"),
        F.lit("supplies").alias("edge_type"),
        F.lit("part").alias("non_core_type"),
    ).distinct()
    sp = SearchProblem(
        beam_size=10, alpha=1.0, global_thresh=0.5, local_thresh=0.5,
        num_to_search=10, num_epochs=30, max_repeated_prior_scores=3,
        min_degree=2,
    )
    return mine_cliques(
        typed, [["supplier", "supplies", "part"]], sp, long_format=True
    )


def _q_events_sessions(spark, sf_dir):
    # built-in session_window (JVM merging state, batch/stream shared
    # definition); oracle = gaps-and-islands SQL.  Spark's session end is
    # last event + gap; a new event starts a new session iff its distance
    # to the previous event is >= the gap (half-open windows).
    from dachshund_spark.streaming.events import session_stats

    return session_stats(_t(spark, sf_dir, "events"), "30 minutes")


def _q_funnel_counts(spark, sf_dir):
    # ordered view -> click -> purchase funnel: per-stage user counts,
    # each stage strictly after the user's previous stage
    from dachshund_spark.streaming.events import funnel_counts

    return funnel_counts(_t(spark, sf_dir, "events"))


def _q_retention_cohorts(spark, sf_dir):
    # weekly retention triangle by first-seen ISO week; integer week
    # arithmetic end to end
    from dachshund_spark.streaming.events import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"), max_weeks=8)


def _q_hourly_counts_stream(spark, sf_dir):
    # the batch hourly tumbling-window aggregate run END-TO-END as a real
    # streaming job (file source -> watermark -> availableNow -> memory
    # sink); append mode emits exactly the windows whose end the final
    # watermark (ms-floored max event time minus the 2h delay) has passed
    import os
    import tempfile
    import uuid

    from dachshund_spark.streaming.events import windowed_counts_stream

    d = tempfile.mkdtemp(prefix="wc_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(d, "part-0.parquet"),
    )
    name = f"evt_wc_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts_stream(spark, d, "1 hour", "2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "window_start", "event_type", "n_events", "total_value"
    )


def _q_click_attribution_stream(spark, sf_dir):
    # stream-stream interval join driven end-to-end (file source ->
    # double watermark -> availableNow -> memory sink); inner-join
    # emission over a bounded input equals the batch interval join
    import os
    import tempfile
    import uuid

    from dachshund_spark.streaming.events import click_purchase_join_stream

    d = tempfile.mkdtemp(prefix="attr_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(d, "part-0.parquet"),
    )
    name = f"evt_attr_{uuid.uuid4().hex[:8]}"
    q = (
        click_purchase_join_stream(spark, d, "1 hour", "2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _q_burst_sessions_stateful(spark, sf_dir):
    # the applyInPandasWithState custom sessionizer, driven END-TO-END as
    # a real streaming job (file source -> availableNow -> memory sink);
    # append mode emits exactly the watermark-finalized sessions, so the
    # oracle is the events_sessions gaps-and-islands SQL restricted to
    # sessions whose end strictly precedes the final watermark
    # (max event time, ms-floored, minus the 2h delay).
    import os
    import tempfile
    import uuid

    from dachshund_spark.streaming.events import burst_sessions_stateful

    d = tempfile.mkdtemp(prefix="burst_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(d, "part-0.parquet"),
    )
    name = f"evt_bursts_{uuid.uuid4().hex[:8]}"
    q = (
        burst_sessions_stateful(spark, d, "30 minutes", "2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("burst_start").alias("session_start"),
        F.col("burst_end").alias("session_end"),
        "n_events",
        "total_value",
    )


def _q_emb_near_dups(spark, sf_dir):
    # embedding-cosine near-duplicate detection, LSH path: bucket
    # self-join candidates -> exact cosine >= 0.9 re-check.  Fixture is
    # clustered (same-cluster cosine ~0.93), so the operator both prunes
    # (no cross join) and recovers the true pair set; recall vs exact is
    # pinned by tests/test_webtext_spark.py::test_embedding_near_dups.
    from dachshund_spark.functions.dedup import embedding_near_duplicates
    from dachshund_spark.functions.similarity import (
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 600, dim=32, n_clusters=30, sigma=0.05, seed=11
    )
    return embedding_near_duplicates(
        emb, threshold=0.9, n_planes=10, n_tables=16, seed=42, dim=32
    )


def _q_events_hourly(spark, sf_dir):
    from dachshund_spark.streaming.events import windowed_event_counts

    return windowed_event_counts(_t(spark, sf_dir, "events"), "1 hour")


def _q_user_activity(spark, sf_dir):
    from dachshund_spark.streaming.events import user_activity

    return user_activity(_t(spark, sf_dir, "events"))


def _q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_nation_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def _cents(col, scale=100):
    return F.round(F.col(col) * scale).cast("long")


def _q_tpch_q10(spark, sf_dir):
    # TPC-H Q10 returned-item-reporting shape: fact filter + two
    # broadcast-able dims, top-20 customers by exact-cents revenue
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-07-01"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def _q_tpch_q6(spark, sf_dir):
    # TPC-H Q6 forecasting-revenue shape: pure filter + aggregate — the
    # predicate and the two projected columns must reach the parquet scan
    # (PushedFilters / ReadSchema); revenue in exact cents arithmetic so
    # both engines agree bit-for-bit regardless of sum order
    li = _t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        (
            F.sum(_cents("l_extendedprice") * _cents("l_discount")) / 10000.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def _q_tpch_q3(spark, sf_dir):
    # TPC-H Q3 shipping-priority shape: 3-way join, group, deterministic
    # top-10 (ties broken by orderkey)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = (
        li.filter(F.col("l_shipdate") > F.lit("1998-06-15"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-06-15")),
            li.l_orderkey == o.o_orderkey,
        )
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            o.o_custkey == c.c_custkey,
            "left_semi",
        )
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q_tpch_q5(spark, sf_dir):
    # TPC-H Q5 local-supplier-volume shape: 6-way star join where every
    # dimension is broadcast-eligible; revenue per nation
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(
            r.filter(F.col("r_name") == "ASIA"),
            n.n_regionkey == r.r_regionkey,
            "left_semi",
        )
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return j.groupBy("n_name").agg((F.sum(rev) / 10000.0).alias("revenue"))


def _q_anf_sketch(spark, sf_dir):
    # deterministic FM sketches of every vertex's distance-<=3 ball on the
    # copurchase graph — hash-checked bit-for-bit against the sequential
    # kernel (oracles.ora_anf); see operators/anf.py for the design
    from dachshund_spark.operators.anf import anf_sketches

    return anf_sketches(copurchase_edges(spark, sf_dir), rounds=3, k=4)


def _q_anf_nf(spark, sf_dir):
    # neighborhood function N(t) + effective-diameter readout from the
    # same sketches: smallest t with frac >= 0.9 is the estimate
    from dachshund_spark.operators.anf import anf_neighborhood_function

    return anf_neighborhood_function(
        copurchase_edges(spark, sf_dir), rounds=3, k=4
    )


def _q_host_graph(spark, sf_dir):
    # synthesize Common-Crawl-style pages (sources.pages, BASELINE.json
    # input_hint schema), run the REAL extraction path (pandas-UDF html
    # parse), roll page links up to the host-level graph.  The oracle
    # re-derives the expected host pairs from the synthesis arithmetic
    # alone, so a single byte wrong in extraction breaks the hash — this
    # puts the byte-identical-extraction invariant inside the hash gate.
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import host_graph, synthesize_pages

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    return host_graph(extract(pages))


def _q_ppr(spark, sf_dir):
    # personalized PageRank: teleport mass restricted to the deterministic
    # seed set v % 17 == 0; oracle = DuckDB recursive-CTE mirror (same
    # pattern as graph_pagerank_5iter)
    from dachshund_spark.operators.builders import symmetrized
    from dachshund_spark.operators.pagerank import pagerank

    e = symmetrized(copurchase_edges(spark, sf_dir))
    seeds = (
        e.select(F.col("src").alias("v"))
        .distinct()
        .filter(F.pmod("v", F.lit(17)) == 0)
    )
    pr = pagerank(e, tol=0.0, max_iter=5, impl="sql", teleport=seeds)
    return pr.select("v", F.round("pagerank", 6).alias("pagerank"))


def _q_assortativity(spark, sf_dir):
    from dachshund_spark.operators.graphstats import degree_assortativity

    return degree_assortativity(copurchase_edges(spark, sf_dir))


def _q_link_reciprocity(spark, sf_dir):
    # reciprocity of the DIRECTED page-link graph (event chains are
    # time-ordered and so structurally reciprocity-free; the web graph is
    # the natural digraph with genuine mutual links).  Runs the full
    # synthesize -> extract -> edge-materialization path.
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.graphstats import reciprocity
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import (
        edges_from_extracted,
        synthesize_pages,
    )

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    return reciprocity(edges_from_extracted(extract(pages)))


def _q_host_rank(spark, sf_dir):
    # the webby composite: synthesize pages -> extract -> host-level
    # rollup -> WEIGHTED PageRank over (src_host, dst_host, links)
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.pagerank import pagerank
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import host_graph, synthesize_pages

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    hg = host_graph(extract(pages)).select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("links").alias("weight"),
    )
    pr = pagerank(hg, tol=0.0, max_iter=5, weight_col="weight")
    return pr.select(
        F.col("v").alias("host"), F.round("pagerank", 6).alias("host_rank")
    )


def _q_host_trustrank(spark, sf_dir):
    # TrustRank (Gyongyi et al., VLDB'04): personalized + weighted
    # PageRank on the host graph, teleport restricted to the 16 hub
    # hosts — the spam-demotion composite a web pipeline runs next to
    # plain host-rank. Exercises weight_col and teleport TOGETHER.
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.pagerank import pagerank
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import host_graph, synthesize_pages

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    hg = host_graph(extract(pages)).select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("links").alias("weight"),
    )
    seeds = spark.createDataFrame(
        [(f"site{i}.test",) for i in range(16)], "v string"
    )
    pr = pagerank(
        hg, tol=0.0, max_iter=5, weight_col="weight", teleport=seeds
    )
    return pr.select(
        F.col("v").alias("host"), F.round("pagerank", 6).alias("trust_rank")
    )


def _q_page_hits(spark, sf_dir):
    # HITS hubs/authorities over the synthesized page-link digraph —
    # the full synthesize -> extract -> edge-materialization path, then
    # Kleinberg's two-vector iteration, ids joined back to urls
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.hits import hits
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import (
        edges_from_extracted,
        synthesize_pages,
        url_dim,
    )

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    hv = hits(edges_from_extracted(extract(pages)), max_iter=8)
    return hv.join(url_dim(pages), "v").select(
        "url",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _q_page_salsa(spark, sf_dir):
    # SALSA over the same page-link digraph as web_page_hits_8iter — the
    # degree-normalized walk needs ZERO driver actions per iteration
    # (transition weights are static edge attributes), vs HITS's
    # per-half-step L1 collect
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.salsa import salsa
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import (
        edges_from_extracted,
        synthesize_pages,
        url_dim,
    )

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7,
    )
    hv = salsa(edges_from_extracted(extract(pages)), max_iter=8)
    return hv.join(url_dim(pages), "v").select(
        "url",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _q_anchor_index(spark, sf_dir):
    # incoming anchor-text index (the classic web-search ranking signal):
    # top-3 anchor terms per target page over the varied-anchor fixture —
    # one map-side-combining (target, term) groupBy + a WindowGroupLimit
    # top-k, all JVM-side
    from dachshund_spark.functions.extraction import anchor_text_index
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(
        spark, n_pages=host_graph_pages(sf_dir), n_sites=53, n_hubs=16,
        seed=7, varied_anchors=True,
    )
    return anchor_text_index(pages, k=3)


def _q_harmonic_sampled(spark, sf_dir):
    # harmonic (closeness-family) centrality from 100 md5-sampled sources:
    # all sources run simultaneously as (source, v) BFS supersteps, the
    # 1/d fold is one fixed-order codegen'd expression over a per-depth
    # pivot — float-exact vs the sequential kernel
    from dachshund_spark.operators.centrality import harmonic_centrality

    return harmonic_centrality(
        copurchase_edges(spark, sf_dir), max_sources=100, seed=0
    )


def _q_anf_eff_diameter(spark, sf_dir):
    # 0.9-effective diameter from the ANF sketches (the Broder/Palmer
    # web-graph headline number): smallest t with N(t) >= 0.9 N(rounds),
    # linearly interpolated; the interpolation code path is SHARED with
    # the oracle (operators.anf.effective_diameter_from_totals)
    from dachshund_spark.operators.anf import anf_effective_diameter

    return anf_effective_diameter(
        copurchase_edges(spark, sf_dir), q=0.9, rounds=3, k=4
    )


def _q_anf_harmonic(spark, sf_dir):
    # HyperBall-style harmonic centrality for EVERY vertex at once from
    # the FM sketches — the 100 TB companion to the exact sampled path
    # (graph_harmonic_centrality_sampled): rounds supersteps total
    # instead of one BFS per source
    from dachshund_spark.operators.anf import anf_harmonic_centrality

    return anf_harmonic_centrality(
        copurchase_edges(spark, sf_dir), rounds=3, k=4
    )


def _q_web_bowtie(spark, sf_dir):
    # Broder bow-tie decomposition of the page-link digraph: synthesize ->
    # extract -> edges, banded so the outer quarters are internal DAGs
    # (ascending ids only) while the middle half keeps its random
    # structure — CORE/IN/OUT/TENDRIL_TUBE/DISCONNECTED all realizable.
    # Composes three gated primitives: true-SCC peeling, hash-min WCC,
    # and frontier BFS reach sets (operators/bowtie.py)
    from dachshund_spark.functions.extraction import extract
    from dachshund_spark.operators.bowtie import bowtie_decomposition
    from dachshund_spark.oracles import host_graph_pages
    from dachshund_spark.sources.pages import (
        edges_from_extracted,
        synthesize_pages,
    )

    from dachshund_spark.sources.pages import url_dim

    n = host_graph_pages(sf_dir)
    pages = synthesize_pages(
        spark, n_pages=n, n_sites=53, n_hubs=16, seed=7
    )
    e = edges_from_extracted(extract(pages))
    # the edge table carries xxhash64 url ids; band/classify on the PAGE
    # NUMBER (parsed back out of the url), so the output ids match the
    # sequential oracle's page indices.  The dim join is the standard
    # id<->key lookup shape — broadcast-sized per crawl partition
    dim = url_dim(pages).select(
        "v",
        F.regexp_extract("url", r"page(\d+)$", 1).cast("long").alias("page"),
    )
    e = (
        e.join(dim.select(F.col("v").alias("src"), F.col("page").alias("ps")), "src")
        .join(dim.select(F.col("v").alias("dst"), F.col("page").alias("pd")), "dst")
        .select(F.col("ps").alias("src"), F.col("pd").alias("dst"))
    )
    q1, q3 = n // 4, 3 * n // 4

    def band(c):
        return F.when(c < q1, 0).when(c < q3, 1).otherwise(2)

    bu, bv = band(F.col("src")), band(F.col("dst"))
    banded = e.filter(
        (bu <= bv)
        & (
            ((bu == 1) & (bv == 1))
            | (F.col("src") < F.col("dst"))
            | (bu != bv)
        )
    )
    return bowtie_decomposition(banded)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_degree": _q_degree,
        "graph_degree_distribution": _q_degree_distribution,
        "graph_top_degree": _q_top_degree,
        "graph_triangle_count_per_vertex": _q_triangles,
        "graph_global_stats": _q_transitivity,
        "graph_clustering_coefficient": _q_clustering,
        "graph_connected_components_paths": _q_cc_paths,
        "graph_connected_components_giant": _q_cc_giant,
        "graph_cc_discovery_order": _q_cc_discovery_order,
        "graph_pagerank_5iter": _q_pagerank,
        "graph_pagerank_csr_5iter": _q_pagerank_csr,
        "graph_label_propagation_2iter": _q_label_propagation,
        "graph_coreness": _q_coreness,
        "graph_k_core_components_k60": _q_k_core_components_k60,
        "graph_k_core_components_k80": _q_k_core_components_k80,
        "graph_k_truss_edges_k4": _q_k_truss_edges_k4,
        "graph_min_degree_prune_k16": _q_min_degree_prune_k16,
        "graph_betweenness_sampled": _q_betweenness_sampled,
        "graph_betweenness_exact": _q_betweenness_exact,
        "graph_betweenness_superstep": _q_betweenness_superstep,
        "graph_eigenvector_centrality": _q_eigenvector_centrality,
        "graph_coreness_anomaly": _q_coreness_anomaly,
        "graph_weighted_coreness": _q_weighted_coreness,
        "graph_scc": _q_scc,
        "graph_wcc_digraph": _q_wcc_digraph,
        "graph_is_acyclic": _q_is_acyclic,
        "graph_cc_twophase": _q_cc_twophase,
        "graph_shortest_path_dag": _q_shortest_path_dag,
        "graph_core_assignments_per_user": _q_core_assignments_per_user,
        "graph_kpeaks_per_user": _q_kpeaks_per_user,
        "graph_cnm_per_user": _q_cnm_per_user,
        "graph_brokerage_per_user": _q_brokerage_per_user,
        "graph_weighted_core_miner_per_user": _q_weighted_core_miner_per_user,
        "graph_spectral_per_user": _q_spectral_per_user,
        "graph_approx_stats_per_user": _q_approx_stats_per_user,
        "emb_ann_recall": _q_ann_recall,
        "emb_ann_clustered_pruning": _q_ann_clustered,
        "emb_ivf_clustered_pruning": _q_ivf_clustered,
        "media_frame_sample": _q_media_frame_sample,
        "media_feature_stats": _q_media_feature_stats,
        "media_wav_feature_stats": _q_wav_features,
        "media_image_feature_stats": _q_image_features,
        "events_hub_salted_join": _q_hub_salted_join,
        "media_video_feature_stats": _q_video_features,
        "graph_bfs_from_min": _q_bfs,
        "doc_token_counts": _q_token_counts,
        "doc_unigram_surprisal": _q_unigram_surprisal,
        "doc_quality_scores": _q_quality,
        "doc_lang_id": _q_lang_id,
        "doc_exact_duplicates": _q_exact_dups,
        "doc_winnow_fingerprints": _q_winnow_fingerprints,
        "doc_bpe_token_counts": _q_bpe_token_counts,
        "doc_dedup_clusters": _q_dedup_clusters,
        "doc_minhash_lsh_pairs": _q_minhash_pairs,
        "doc_ngram_jaccard_pairs": _q_jaccard_pairs,
        "doc_simhash": _q_simhash,
        "emb_cosine_topk": _q_cosine_topk,
        "graph_featurizer_per_user": _q_featurizer_per_user,
        "graph_core_miner_per_user": _q_core_miner_per_user,
        "graph_clique_miner": _q_clique_miner,
        "graph_clique_miner_long": _q_clique_miner_long,
        "events_hourly_counts": _q_events_hourly,
        "events_sessions": _q_events_sessions,
        "events_burst_sessions_stateful": _q_burst_sessions_stateful,
        "events_hourly_counts_stream": _q_hourly_counts_stream,
        "events_click_attribution_stream": _q_click_attribution_stream,
        "events_funnel_counts": _q_funnel_counts,
        "events_retention_cohorts": _q_retention_cohorts,
        "doc_embedding_near_dups": _q_emb_near_dups,
        "events_user_activity": _q_user_activity,
        "tpch_q1_pricing_summary": _q_tpch_q1,
        "tpch_nation_orders": _q_nation_orders,
        "tpch_q3_shipping_priority": _q_tpch_q3,
        "tpch_q5_local_supplier_volume": _q_tpch_q5,
        "tpch_q6_forecast_revenue": _q_tpch_q6,
        "tpch_q10_returned_items": _q_tpch_q10,
        "graph_anf_sketch_t3": _q_anf_sketch,
        "web_host_graph": _q_host_graph,
        "graph_personalized_pagerank_5iter": _q_ppr,
        "graph_degree_assortativity": _q_assortativity,
        "web_link_reciprocity": _q_link_reciprocity,
        "web_host_rank_5iter": _q_host_rank,
        "web_page_hits_8iter": _q_page_hits,
        "web_host_trustrank_5iter": _q_host_trustrank,
        "graph_anf_neighborhood_fn": _q_anf_nf,
        "graph_adamic_adar_link_pred": _q_adamic_adar,
        "doc_tfidf_top_terms": _q_tfidf_top5,
        "doc_top_bigrams": _q_top_bigrams,
        "graph_harmonic_centrality_sampled": _q_harmonic_sampled,
        "graph_anf_effective_diameter": _q_anf_eff_diameter,
        "graph_anf_harmonic_centrality": _q_anf_harmonic,
        "web_bowtie_structure": _q_web_bowtie,
        "graph_mst_forest": _q_mst_forest,
        "graph_topological_levels": _q_topo_levels,
        "graph_random_walks": _q_random_walks,
        "graph_luby_mis": _q_luby_mis,
        "graph_maximal_matching": _q_maximal_matching,
        "graph_double_sweep_diameter": _q_double_sweep,
        "graph_louvain_moves": _q_louvain_moves,
        "graph_louvain_modularity": _q_louvain_modularity,
        "doc_gopher_repetition": _q_gopher_repetition,
        "graph_node2vec_walks": _q_node2vec_walks,
        "events_user_sample": _q_user_sample,
        "graph_trussness": _q_trussness,
        "graph_sssp_weighted": _q_sssp_weighted,
        "graph_butterfly_topk": _q_butterfly_topk,
        "graph_biconnectivity_per_user": _q_biconnectivity_per_user,
        "graph_jp_coloring": _q_jp_coloring,
        "web_url_dedup": _q_url_dedup,
        "web_spam_mass": _q_spam_mass,
        "events_value_percentiles": _q_value_percentiles,
        "emb_kmeans_assignments": _q_kmeans_assignments,
        "emb_pq_codes": _q_pq_codes,
        "emb_pq_adc_topk": _q_pq_adc_topk,
        "doc_pii_redaction": _q_pii_redaction,
        "web_line_dedup": _q_line_dedup,
        "web_page_salsa_8iter": _q_page_salsa,
        "web_anchor_text_index": _q_anchor_index,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI)
# ---------------------------------------------------------------------------

_LANG_MARKERS_SQL = {
    "en": r"\b(the|and|of|to|in|is|that|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|que|pour|dans|une)\b",
    "es": r"\b(el|la|los|las|y|es|que|para|con)\b",
}

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

# CP_SMALL (both part keys <= 500) derivation for the exact/expensive ops
_CPS_SQL = """
edges AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
                  greatest(a.l_partkey, b.l_partkey) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  WHERE a.l_partkey <= 500 AND b.l_partkey <= 500
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM sym)
"""

# event digraph with per-chain back-edges for even users (see
# event_cyc_edges) — shared by the SCC / WCC / acyclicity oracles
_EVC_SQL = """
ev AS (
  SELECT event_id, user_id, date_trunc('day', ts) AS day, ts FROM events
),
o AS (
  SELECT event_id, user_id, day,
         row_number() OVER (PARTITION BY user_id, day
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, day) AS c
  FROM ev
),
fwd AS (
  SELECT src, dst FROM (
    SELECT event_id AS src,
           lead(event_id) OVER (PARTITION BY user_id, day
                                ORDER BY ts, event_id) AS dst
    FROM ev
  ) WHERE dst IS NOT NULL
),
grp AS (
  SELECT user_id, day, min(event_id) AS m, count(*) AS c
  FROM ev GROUP BY user_id, day
)
"""


def _simhash_oracle_sql() -> str:
    bit = (
        lambda i: f"(CAST(({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1 AS BIGINT))"
    )
    votes = ", ".join(f"sum({bit(i)} * 2 - 1) AS v{i}" for i in range(64))
    terms = " + ".join(
        f"CASE WHEN v{i} > 0 THEN "
        + ("(-9223372036854775807 - 1)" if i == 63 else str(1 << i))
        + " ELSE 0 END"
        for i in range(64)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
parts AS (
  SELECT doc_id,
         ('0x' || substring(md5(tok), 1, 8))::UBIGINT AS hi,
         ('0x' || substring(md5(tok), 9, 8))::UBIGINT AS lo
  FROM toks WHERE tok <> ''
),
votes AS (SELECT doc_id, {votes} FROM parts GROUP BY doc_id),
sigs AS (SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM votes)
SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sigs s USING (doc_id)"""


_SHINGLE_SQL = f"""
docs_n AS (
  SELECT doc_id, lang, {_NORM_SQL} AS norm FROM documents
),
tok AS (
  SELECT doc_id, lang, string_split(norm, ' ') AS tokens FROM docs_n
),
sh AS (
  SELECT doc_id, lang, unnest(list_distinct(
    CASE WHEN len(tokens) >= 3 THEN
      list_transform(range(1, len(tokens) - 1),
                     j -> array_to_string(list_slice(tokens, j, j + 2), ' '))
    ELSE [array_to_string(tokens, ' ')] END)) AS shingle
  FROM tok
)
"""


def oracle_sql() -> dict[str, str]:
    sql = {}
    sql["graph_degree"] = f"WITH {_CP_SQL} SELECT v, degree FROM deg"
    sql["graph_degree_distribution"] = (
        f"WITH {_CP_SQL} SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree"
    )
    sql["graph_top_degree"] = f"""
WITH {_CP_SQL}
SELECT v, degree, rank FROM (
  SELECT v, degree, row_number() OVER (ORDER BY degree DESC, v ASC) AS rank FROM deg
) WHERE rank <= 20"""
    sql["graph_triangle_count_per_vertex"] = f"""
WITH {_CP_SQL}, {_TRI_SQL}
SELECT verts.v, coalesce(t.triangles, 0) AS triangles
FROM verts LEFT JOIN tri_per_v t ON verts.v = t.v"""
    sql["graph_global_stats"] = f"""
WITH {_CP_SQL}, {_TRI_SQL}
SELECT (SELECT count(*) FROM verts) AS n_vertices,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*) FROM tri) AS n_triangles,
       round(3.0 * (SELECT count(*) FROM tri)
             / (SELECT sum(degree * (degree - 1) / 2) FROM deg), 6) AS transitivity,
       (SELECT round(avg(2.0 * coalesce(t.triangles, 0) / (d.degree * (d.degree - 1))), 6)
        FROM deg d LEFT JOIN tri_per_v t ON d.v = t.v WHERE d.degree > 1) AS avg_clustering"""
    sql["graph_clustering_coefficient"] = f"""
WITH {_CP_SQL}, {_TRI_SQL}
SELECT d.v, d.degree,
       CASE WHEN d.degree > 1
            THEN round(2.0 * coalesce(t.triangles, 0) / (d.degree * (d.degree - 1)), 6)
       END AS coefficient
FROM deg d LEFT JOIN tri_per_v t ON d.v = t.v"""
    sql["graph_connected_components_paths"] = f"""
WITH {_EV_SQL}
SELECT e.event_id AS v, m.comp AS component
FROM ev e JOIN (
  SELECT user_id, day, min(event_id) AS comp, count(*) AS c
  FROM ev GROUP BY user_id, day
) m ON e.user_id = m.user_id AND e.day = m.day
WHERE m.c >= 2"""
    sql["graph_cc_discovery_order"] = f"""
WITH {_EV_SQL},
cc AS (
  SELECT e.event_id AS v, m.comp AS component
  FROM ev e JOIN (
    SELECT user_id, day, min(event_id) AS comp, count(*) AS c
    FROM ev GROUP BY user_id, day
  ) m ON e.user_id = m.user_id AND e.day = m.day
  WHERE m.c >= 2
)
SELECT v, component,
       dense_rank() OVER (ORDER BY component) - 1 AS component_idx
FROM cc"""
    # giant component: BFS reachability from the global min vertex proves
    # connectivity; every reached vertex has component = min id.  If the
    # graph were not connected the row counts would mismatch loudly.
    sql["graph_connected_components_giant"] = f"""
WITH RECURSIVE {_CP_SQL},
bfs(v) AS (
  SELECT (SELECT min(src) FROM edges)
  UNION
  SELECT sym.dst FROM bfs JOIN sym ON sym.src = bfs.v
)
SELECT v, (SELECT min(src) FROM edges) AS component FROM bfs"""
    pr_iter = """
pr{k} AS (
  SELECT verts.v, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.m, 0) AS r
  FROM verts LEFT JOIN (
    SELECT sym.dst AS v, sum(pr{j}.r / outd.d) AS m
    FROM sym JOIN pr{j} ON sym.src = pr{j}.v JOIN outd ON sym.src = outd.src
    GROUP BY sym.dst
  ) s ON verts.v = s.v
)"""
    pr_sql = f"""
WITH {_CP_SQL},
n AS (SELECT count(*) AS c FROM verts),
outd AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
pr0 AS (SELECT v, 1.0 / (SELECT c FROM n) AS r FROM verts),
{",".join(pr_iter.format(k=k, j=k - 1) for k in range(1, 6))}
SELECT v, round(r, 6) AS pagerank FROM pr5"""
    sql["graph_pagerank_5iter"] = pr_sql
    sql["graph_pagerank_csr_5iter"] = pr_sql
    # personalized variant: restart + (zero, on the symmetric graph)
    # dangling mass flow to p(v) = 1/|seeds| on the seed set
    ppr_iter = """
ppr{k} AS (
  SELECT pv.v, 0.15 * pv.p + 0.85 * coalesce(s.m, 0) AS r
  FROM pv LEFT JOIN (
    SELECT sym.dst AS v, sum(ppr{j}.r / outd.d) AS m
    FROM sym JOIN ppr{j} ON sym.src = ppr{j}.v JOIN outd ON sym.src = outd.src
    GROUP BY sym.dst
  ) s ON pv.v = s.v
)"""
    sql["graph_personalized_pagerank_5iter"] = f"""
WITH {_CP_SQL},
ns AS (SELECT count(*) AS c FROM verts WHERE v % 17 = 0),
pv AS (SELECT v, CASE WHEN v % 17 = 0 THEN 1.0 / (SELECT c FROM ns)
                      ELSE 0.0 END AS p FROM verts),
outd AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
ppr0 AS (SELECT v, p AS r FROM pv),
{",".join(ppr_iter.format(k=k, j=k - 1) for k in range(1, 6))}
SELECT v, round(r, 6) AS pagerank FROM ppr5"""
    sql["graph_degree_assortativity"] = f"""
WITH {_CP_SQL},
dd AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
ee AS (
  SELECT a.d AS ds, b.d AS dd
  FROM sym JOIN dd a ON sym.src = a.src JOIN dd b ON sym.dst = b.src
),
agg AS (
  SELECT count(*) AS m, sum(ds) AS sx, sum(dd) AS sy,
         sum(ds * dd) AS sxy, sum(ds * ds) AS sxx, sum(dd * dd) AS syy
  FROM ee
)
SELECT m AS m_edges,
       (cast(m as double) * cast(sxy as double)
        - cast(sx as double) * cast(sy as double))
       / sqrt((cast(m as double) * cast(sxx as double)
        - cast(sx as double) * cast(sx as double))
       * (cast(m as double) * cast(syy as double)
        - cast(sy as double) * cast(sy as double))) AS assortativity
FROM agg"""
    lp_iter = """
l{k} AS (
  SELECT v, label FROM (
    SELECT c.v, c.label,
           row_number() OVER (PARTITION BY c.v ORDER BY c.cnt DESC, c.label ASC) AS rn
    FROM (
      SELECT sym.dst AS v, l{j}.label, count(*) AS cnt
      FROM sym JOIN l{j} ON sym.src = l{j}.v
      GROUP BY sym.dst, l{j}.label
    ) c
  ) WHERE rn = 1
)"""
    sql["graph_label_propagation_2iter"] = f"""
WITH {_EV_SQL},
l0 AS (SELECT v, v AS label FROM verts),
{",".join(lp_iter.format(k=k, j=k - 1) for k in range(1, 3))}
SELECT v, label FROM l2"""
    sql["graph_bfs_from_min"] = f"""
WITH RECURSIVE {_CP_SQL},
bfs(v, dist) AS (
  SELECT (SELECT min(src) FROM edges), 0
  UNION
  -- recursion safety bound; must exceed the co-purchase graph's
  -- eccentricity at every gate scale (measured <= 4; dense graph)
  SELECT sym.dst, bfs.dist + 1 FROM bfs JOIN sym ON sym.src = bfs.v
  WHERE bfs.dist < 30
)
SELECT v, min(dist) AS dist FROM bfs GROUP BY v"""
    sql["doc_token_counts"] = """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       length(text) AS n_chars
FROM documents"""
    sql["doc_unigram_surprisal"] = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, ws[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
  WHERE ws[i] <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
cnt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM cnt)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(sum(tf * bits) AS BIGINT) AS sum_bits,
       CAST(sum(tf * bits) * 1000 // sum(tf) AS BIGINT) AS mean_millibits
FROM (
  SELECT tf.doc_id, tf.tf,
         (length(to_base(total_n, 2)) - 1)
           - (length(to_base(n, 2)) - 1) AS bits
  FROM tf JOIN cnt USING (term) CROSS JOIN tot
)
GROUP BY doc_id"""
    sql["doc_bpe_token_counts"] = """
SELECT doc_id,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
           AS n_bpe_tokens,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_ws_tokens
FROM documents"""
    sql["doc_tfidf_top_terms"] = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, ws[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
  WHERE ws[i] <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         round(tf.tf * (ln((1 + nd.n_docs) / (1.0 + dfq.df)) + 1), 6)
           AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC
         ) AS rank
  FROM tf JOIN dfq USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, df, tfidf, rank FROM s WHERE rank <= 5"""
    sql["doc_top_bigrams"] = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, ws[i] AS term, i AS pos
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
  WHERE ws[i] <> ''
),
grams AS (
  SELECT term || ' ' ||
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS ngram,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
           AS complete
  FROM tok
)
SELECT ngram, count(*) AS n_occurrences FROM grams WHERE complete
GROUP BY ngram ORDER BY n_occurrences DESC, ngram ASC LIMIT 20"""
    sql["doc_quality_scores"] = """
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       n_tokens,
       round(len(regexp_extract_all(text, '[.!?,;:]'))
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(regexp_extract_all(lower(text),
             '\\b(the|and|of|to|in|is|that|for|with)\\b'))
             / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(length(regexp_replace(text, '\\s+', '', 'g'))
             / greatest(n_tokens, 1), 6) AS mean_token_len
FROM base"""
    lang_counts = ", ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS c_{lang}"
        for lang, pat in _LANG_MARKERS_SQL.items()
    )
    sql["doc_lang_id"] = f"""
WITH scored AS (SELECT doc_id, {lang_counts} FROM documents)
SELECT doc_id,
       CASE WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
            WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
            WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
            ELSE 'es' END AS pred_lang,
       greatest(c_en, c_de, c_fr, c_es) AS marker_count
FROM scored"""
    sql["doc_exact_duplicates"] = f"""
SELECT md5({_NORM_SQL}) AS fingerprint,
       min(doc_id) AS rep_doc_id, count(*) AS dup_count
FROM documents GROUP BY 1 HAVING count(*) > 1"""
    # winnowing (MOSS) fingerprints, k=8 window=4: per-position k-gram md5
    # prefixes, window minima via a bounded-following window frame, then a
    # set digest over the sorted distinct minima — mirrors
    # textops.winnow_fingerprints exactly (md5/substr are bit-identical
    # across Spark and DuckDB)
    sql["doc_winnow_fingerprints"] = f"""
WITH base AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM documents
),
pos AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i,
         substr(md5(substr(norm, CAST(i AS INTEGER), 8)), 1, 16) AS h,
         length(norm) - 8 + 1 AS p
  FROM base, LATERAL unnest(generate_series(1, length(norm) - 8 + 1)) AS t(i)
),
winmin AS (
  SELECT doc_id, i, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM pos
),
fps AS (SELECT DISTINCT doc_id, wmin FROM winmin WHERE i <= p - 3)
SELECT doc_id, count(*) AS n_fingerprints,
       md5(string_agg(wmin, '' ORDER BY wmin)) AS fingerprint_digest
FROM fps GROUP BY doc_id"""
    minhash_cols = ", ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(12)
    )
    band_cols = ", ".join(
        f"md5(concat_ws('|', h{b * 3}, h{b * 3 + 1}, h{b * 3 + 2})) AS bkt{b}"
        for b in range(4)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, bkt{b} AS bucket FROM sig" for b in range(4)
    )
    sql["doc_minhash_lsh_pairs"] = f"""
WITH {_SHINGLE_SQL},
mh AS (SELECT doc_id, {minhash_cols} FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {band_cols} FROM mh),
buckets AS ({band_union})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id"""
    # duplicate clusters = connected components of the LSH pair graph;
    # min-label closure with the "label flows only to larger ids" prune —
    # the component minimum still reaches every member (all intermediates
    # on a path from the minimum exceed it), and min(l) per vertex is
    # unaffected by other labels' pruned propagation
    sql["doc_dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLE_SQL},
mh AS (SELECT doc_id, {minhash_cols} FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {band_cols} FROM mh),
buckets AS ({band_union}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(v, l) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v
  WHERE r.l < e.dst
),
comp AS (SELECT v, min(l) AS cluster_rep FROM reach GROUP BY v)
SELECT c.v AS doc_id, c.cluster_rep, s.cluster_size
FROM comp c
JOIN (SELECT cluster_rep, count(*) AS cluster_size
      FROM comp GROUP BY cluster_rep) s
  ON c.cluster_rep = s.cluster_rep"""
    sql["doc_ngram_jaccard_pairs"] = f"""
WITH {_SHINGLE_SQL},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.4"""
    sql["emb_cosine_topk"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings
),
q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 8),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q_emb, emb), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(q_emb, x -> x * x)))
            * sqrt(list_sum(list_transform(emb, x -> x * x)))) AS cos_raw
  FROM q, e WHERE query_id <> e.vec_id
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10"""
    sql["events_sessions"] = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, sid"""
    # stateful-stream variant: same sessionization, restricted to sessions
    # finalized by the end-of-stream watermark (ms-floored max event time
    # minus the 2h delay), mirroring append-mode emission exactly
    sql["events_burst_sessions_stateful"] = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
agg AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end,
         count(*) AS n_events,
         round(sum(value), 6) AS total_value
  FROM s GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events, total_value
FROM agg
WHERE epoch_ms(session_end)
      < (SELECT max(epoch_ms(ts)) FROM events) - 7200000"""
    sql["events_hourly_counts"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2"""
    sql["events_hourly_counts_stream"] = """
WITH wm AS (
  SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 2 HOUR AS w
  FROM events
)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
HAVING window_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)"""
    sql["events_click_attribution_stream"] = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'"""
    sql["events_funnel_counts"] = """
WITH tv AS (SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1),
tc AS (SELECT e.user_id, min(e.ts) AS t_click
       FROM events e JOIN tv USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > tv.t_view GROUP BY 1),
tp AS (SELECT e.user_id, min(e.ts) AS t_purchase
       FROM events e JOIN tc USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > tc.t_click GROUP BY 1)
SELECT 1 AS stage_ord, 'view' AS stage,
       (SELECT count(*) FROM tv) AS n_users
UNION ALL
SELECT 2, 'click_after_view', (SELECT count(*) FROM tc)
UNION ALL
SELECT 3, 'purchase_after_click', (SELECT count(*) FROM tp)"""
    sql["events_retention_cohorts"] = """
WITH ev AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
cohort AS (SELECT user_id, min(w) AS cohort_week FROM ev GROUP BY 1),
uw AS (
  SELECT DISTINCT ev.user_id, cohort_week,
         CAST(datediff('day', cohort_week, w) // 7 AS INTEGER)
           AS week_offset
  FROM ev JOIN cohort USING (user_id)
)
SELECT cohort_week, week_offset, count(*) AS n_users
FROM uw WHERE week_offset <= 8
GROUP BY 1, 2"""
    sql["events_user_activity"] = """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value,
       count(DISTINCT event_type) AS n_event_types
FROM events GROUP BY user_id"""
    sql["tpch_q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""
    sql["tpch_nation_orders"] = """
SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""
    sql["tpch_q10_returned_items"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20"""
    sql["tpch_q6_forecast_revenue"] = """
SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""
    sql["tpch_q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1998-06-15'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10"""
    sql["tpch_q5_local_supplier_volume"] = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
GROUP BY n_name"""

    # -- pure-SQL oracles for the round-2 operators ------------------------
    sql["doc_simhash"] = _simhash_oracle_sql()
    sql["graph_scc"] = f"""
WITH {_EVC_SQL}
SELECT e.event_id AS v,
       CASE WHEN e.user_id % 2 = 0 THEN g.m ELSE e.event_id END AS component
FROM ev e JOIN grp g ON e.user_id = g.user_id AND e.day = g.day
WHERE g.c >= 2"""
    sql["graph_wcc_digraph"] = f"""
WITH {_EVC_SQL}
SELECT e.event_id AS v, g.m AS component
FROM ev e JOIN grp g ON e.user_id = g.user_id AND e.day = g.day
WHERE g.c >= 2"""
    # acyclicity witnesses computed from the data: the chain digraph is
    # acyclic iff every edge strictly increases (ts, event_id) (a
    # topological order); the cyc variant has a cycle iff any even-user
    # chain of length >= 2 exists (those get a back-edge)
    sql["graph_is_acyclic"] = f"""
WITH {_EVC_SQL}
SELECT 'event_chain' AS graph,
       (SELECT coalesce(bool_and((d.ts, d.event_id) > (s.ts, s.event_id)), TRUE)
        FROM fwd JOIN ev s ON fwd.src = s.event_id
                 JOIN ev d ON fwd.dst = d.event_id) AS acyclic
UNION ALL
SELECT 'event_chain_cyc',
       NOT EXISTS (SELECT 1 FROM o WHERE c >= 2 AND user_id % 2 = 0)"""
    # two-phase CC computes the same min-id components as hash-min LP
    sql["graph_cc_twophase"] = sql["graph_connected_components_paths"]
    sql["graph_shortest_path_dag"] = f"""
WITH RECURSIVE {_CPS_SQL},
bfs(v, dist) AS (
  SELECT (SELECT min(src) FROM edges), 0
  UNION
  -- dist < 100 is a recursion SAFETY bound only (cycles make unbounded
  -- (v, dist) pairs): it must exceed any plausible eccentricity of the
  -- cp_small graph at every gate scale, else the ORACLE silently drops
  -- distant vertices while the Spark BFS (max_depth=10000) keeps them.
  -- cp_small has <= 500 vertices, so eccentricity < 500 but measured
  -- <= 6 at sf0.001-0.1; 100 leaves a wide margin at bounded cost.
  SELECT sym.dst, bfs.dist + 1 FROM bfs JOIN sym ON sym.src = bfs.v
  WHERE bfs.dist < 100
),
d AS (SELECT v, min(dist) AS dd FROM bfs GROUP BY v)
SELECT s.dst AS v, s.src AS parent
FROM sym s JOIN d du ON s.src = du.v JOIN d dv ON s.dst = dv.v
WHERE du.dd + 1 = dv.dd
UNION ALL
SELECT (SELECT min(src) FROM edges), (SELECT min(src) FROM edges)"""
    sql["media_frame_sample"] = """
WITH m AS (
  SELECT i AS media_id, (3 + (i * 7 + 42) % 28) * 100 AS duration_ms
  FROM range(3000) t(i)
),
f AS (
  SELECT media_id, duration_ms,
         greatest(CAST(floor(duration_ms / 1000.0 * 2.0) AS INT), 1) AS n_frames
  FROM m
)
SELECT media_id,
       unnest(range(n_frames)) AS frame_idx,
       duration_ms / n_frames AS frame_interval_ms
FROM f"""

    # -- kernel oracles: expected outputs computed in-process by the
    # pure-python kernels on identically derived inputs, materialized as
    # VALUES literals (see dachshund_spark/oracles.py for the rationale)
    from dachshund_spark import oracles as O

    d = O.sf_dir()
    sql["graph_coreness"] = O.ora_coreness(d)
    sql["graph_k_core_components_k60"] = O.ora_k_core_components(d, 60)
    sql["graph_k_core_components_k80"] = O.ora_k_core_components(d, 80)
    sql["graph_k_truss_edges_k4"] = O.ora_k_truss_edges(d, 4)
    sql["graph_min_degree_prune_k16"] = O.ora_min_degree_prune(d, 16)
    sql["graph_betweenness_sampled"] = O.ora_betweenness_sampled(d)
    sql["graph_betweenness_exact"] = O.ora_betweenness_exact(d)
    # same sources, same kernel expectation — the superstep gate shares
    # the sampled oracle by construction
    sql["graph_betweenness_superstep"] = O.ora_betweenness_sampled(d)
    sql["graph_anf_sketch_t3"] = O.ora_anf(d, rounds=3, k=4)
    sql["web_host_graph"] = O.ora_host_graph(d)
    sql["web_link_reciprocity"] = O.ora_link_reciprocity(d)
    sql["web_host_rank_5iter"] = O.ora_host_rank(d)
    sql["web_page_hits_8iter"] = O.ora_page_hits(d)
    sql["web_host_trustrank_5iter"] = O.ora_host_trustrank(d)
    sql["graph_anf_neighborhood_fn"] = O.ora_anf_nf(d, rounds=3, k=4)
    sql["graph_adamic_adar_link_pred"] = O.ora_adamic_adar(d)
    sql["graph_harmonic_centrality_sampled"] = O.ora_harmonic_sampled(d)
    sql["graph_anf_effective_diameter"] = O.ora_anf_effective_diameter(
        d, q=0.9, rounds=3, k=4
    )
    sql["graph_anf_harmonic_centrality"] = O.ora_anf_harmonic(d, rounds=3, k=4)
    sql["web_bowtie_structure"] = O.ora_web_bowtie(d)
    sql["graph_mst_forest"] = O.ora_mst_forest(d)
    sql["graph_topological_levels"] = O.ora_topo_levels(d)
    sql["graph_random_walks"] = O.ora_random_walks(d, walks=2, length=4, seed=0)
    sql["graph_luby_mis"] = O.ora_luby_mis(d, seed=0)
    sql["graph_maximal_matching"] = O.ora_greedy_matching(d)
    sql["graph_double_sweep_diameter"] = O.ora_double_sweep(d)
    sql["graph_louvain_moves"] = O.ora_louvain_moves(d)
    sql["graph_louvain_modularity"] = O.ora_louvain_modularity(d)
    sql["doc_gopher_repetition"] = O.ora_gopher_repetition(d)
    sql["graph_node2vec_walks"] = O.ora_node2vec_walks(
        d, walks=1, length=4, p=2.0, q=0.5, seed=0
    )
    sql["graph_trussness"] = O.ora_trussness(d)
    sql["graph_sssp_weighted"] = O.ora_sssp_weighted(d)
    sql["graph_butterfly_topk"] = """
WITH inc AS (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS p
  FROM lineitem WHERE l_partkey <= 500
),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, COUNT(*) AS c
  FROM inc a JOIN inc b ON a.g = b.g AND a.p < b.p
  GROUP BY 1, 2
),
per AS (
  SELECT v, CAST(SUM(c * (c - 1)) // 2 AS BIGINT) AS butterflies
  FROM (SELECT p1 AS v, c FROM pairs UNION ALL SELECT p2 AS v, c FROM pairs)
  GROUP BY v
  HAVING CAST(SUM(c * (c - 1)) // 2 AS BIGINT) > 0
)
SELECT v, butterflies FROM (
  SELECT v, butterflies,
         ROW_NUMBER() OVER (ORDER BY butterflies DESC, v) AS rn
  FROM per
) WHERE rn <= 20
"""
    sql["events_user_sample"] = """
SELECT user_id, event_id, sample_rank FROM (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY md5(concat('7', '|', CAST(event_id AS VARCHAR))),
                    event_id
         ) AS sample_rank
  FROM events
) WHERE sample_rank <= 5
"""
    sql["graph_eigenvector_centrality"] = O.ora_eigenvector_centrality(d)
    sql["graph_coreness_anomaly"] = O.ora_coreness_anomaly(d)
    sql["graph_weighted_coreness"] = O.ora_weighted_coreness(d)
    sql["graph_core_assignments_per_user"] = O.ora_core_assignments_per_user(d)
    sql["graph_kpeaks_per_user"] = O.ora_kpeaks_per_user(d)
    sql["graph_cnm_per_user"] = O.ora_cnm_per_user(d)
    sql["graph_brokerage_per_user"] = O.ora_brokerage_per_user(d)
    sql["graph_biconnectivity_per_user"] = O.ora_biconnectivity_per_user(d)
    sql["graph_jp_coloring"] = O.ora_jp_coloring(d)
    sql["web_url_dedup"] = O.ora_url_dedup(d)
    sql["web_spam_mass"] = O.ora_spam_mass(d)
    sql["emb_kmeans_assignments"] = O.ora_kmeans_assignments(d)
    sql["emb_pq_codes"] = O.ora_pq_codes(d)
    sql["emb_pq_adc_topk"] = O.ora_pq_adc(d)
    sql["doc_pii_redaction"] = O.ora_pii_redaction(d)
    sql["web_line_dedup"] = O.ora_line_dedup(d)
    sql["web_page_salsa_8iter"] = O.ora_page_salsa(d)
    sql["web_anchor_text_index"] = O.ora_anchor_index(d)
    sql["events_value_percentiles"] = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.90), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""
    sql["graph_weighted_core_miner_per_user"] = (
        O.ora_weighted_core_miner_per_user(d)
    )
    sql["graph_spectral_per_user"] = O.ora_spectral_per_user(d)
    sql["graph_approx_stats_per_user"] = O.ora_approx_stats_per_user(d)
    sql["graph_featurizer_per_user"] = O.ora_featurizer_per_user(d)
    sql["graph_core_miner_per_user"] = O.ora_core_miner_per_user(d)
    sql["graph_clique_miner"] = O.ora_clique_miner(d)
    sql["graph_clique_miner_long"] = O.ora_clique_miner_long(d)
    sql["emb_ann_recall"] = O.ora_ann_recall(d)
    sql["emb_ann_clustered_pruning"] = O.ora_ann_clustered(d)
    sql["emb_ivf_clustered_pruning"] = O.ora_ivf_clustered(d)
    sql["doc_embedding_near_dups"] = O.ora_embedding_near_dups(d)
    sql["media_feature_stats"] = O.ora_media_feature_stats(d)
    sql["media_wav_feature_stats"] = O.ora_wav_feature_stats(d)
    sql["media_image_feature_stats"] = O.ora_image_feature_stats(d)
    sql["media_video_feature_stats"] = O.ora_video_feature_stats(d)
    sql["events_hub_salted_join"] = """
        WITH ev AS (
            SELECT CASE WHEN event_id % 10 < 6 THEN 0
                        ELSE event_id % 1000 END AS hub_key,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_cents
            FROM events
        ), dim AS (
            SELECT i AS hub_key, (i * 7) % 13 AS w10 FROM range(0, 1000) t(i)
        )
        SELECT ev.hub_key AS hub_key,
               COUNT(*) AS n_events,
               SUM(value_cents * w10) / 1000.0 AS weighted_value
        FROM ev JOIN dim USING (hub_key)
        GROUP BY ev.hub_key
    """
    return sql
