"""Kernel-oracle SQL generation for the driver correctness gate.

The driver compares each ``queries()`` entry (Spark) against
``oracle_sql()`` (DuckDB) at sf=0.01.  Set-based operators get genuine
independent SQL oracles.  For iterative / priority-queue operators that
set-based SQL cannot express (coreness peeling, k-trusses, Brandes
betweenness, CNM, beam search, ...), the oracle is the pure-Python KERNEL
(``functions/kernels.py`` / ``functions/clique_kernel.py``): an
independent sequential implementation of the reference's algorithms,
itself pinned to the reference's golden unit-test values in ``tests/``.

This module runs those kernels in-process on the SAME deterministically
derived inputs — read straight from the parquet tables with DuckDB, using
the identical derivation SQL the set-based oracles use — and materializes
the expected output as a ``SELECT ... FROM (VALUES ...)`` literal for the
driver's DuckDB side.  The distributed Spark operator is the system under
test; the kernel is the oracle.  No pyspark import happens here.

The sf dir defaults to the driver's correctness scale (sf0.01); override
with ``SPARK_GRAFT_ORACLE_SF_DIR`` (tools/check_correctness.py sets it to
whatever scale it is checking).
"""

from __future__ import annotations

import hashlib
import json
import os
from functools import lru_cache

DEFAULT_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale
ENV = "SPARK_GRAFT_ORACLE_SF_DIR"

CP_SMALL_MAX = 500  # co-purchase subgraph: both part keys <= this
BETWEENNESS_SOURCES = 100  # reference featurizer approximation
BETWEENNESS_SEED = 0
EVCENT_ITERS = 20
WCORE_ROUND = 6


def sf_dir() -> str:
    return os.environ.get(ENV, DEFAULT_SF_DIR)


@lru_cache(maxsize=4)
def _con(d: str):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# shared input derivations (identical SQL to the set-based oracle CTEs)
# ---------------------------------------------------------------------------

_CP_Q = """
SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
                greatest(a.l_partkey, b.l_partkey) AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""

_WCP_Q = f"""
SELECT least(a.l_partkey, b.l_partkey) AS src,
       greatest(a.l_partkey, b.l_partkey) AS dst,
       count(DISTINCT a.l_orderkey) AS weight
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
WHERE a.l_partkey <= {CP_SMALL_MAX} AND b.l_partkey <= {CP_SMALL_MAX}
GROUP BY 1, 2
"""

_USER_CHAIN_Q = """
SELECT user_id AS graph_id, src, dst, sts, dts FROM (
  SELECT user_id, event_id AS src,
         lead(event_id) OVER w AS dst,
         epoch_ms(ts) AS sts,
         lead(epoch_ms(ts)) OVER w AS dts
  FROM events
  WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id)
) WHERE dst IS NOT NULL
"""


@lru_cache(maxsize=4)
def cp_edges(d: str) -> tuple:
    return tuple(_con(d).execute(_CP_Q).fetchall())


@lru_cache(maxsize=4)
def cp_small_edges(d: str) -> tuple:
    return tuple(
        (s, t) for s, t in cp_edges(d) if s <= CP_SMALL_MAX and t <= CP_SMALL_MAX
    )


@lru_cache(maxsize=4)
def wcp_edges(d: str) -> tuple:
    return tuple(_con(d).execute(_WCP_Q).fetchall())


@lru_cache(maxsize=4)
def user_chain_edges(d: str) -> tuple:
    """(graph_id, src, dst, src_epoch_ms, dst_epoch_ms) per in-day event
    succession."""
    return tuple(_con(d).execute(_USER_CHAIN_Q).fetchall())


@lru_cache(maxsize=4)
def _cp_adj(d: str):
    from .functions import kernels as K

    return K.build_undirected_adj(list(cp_edges(d)))


@lru_cache(maxsize=4)
def _cp_small_adj(d: str):
    from .functions import kernels as K

    return K.build_undirected_adj(list(cp_small_edges(d)))


def _user_adjs(d: str):
    from .functions import kernels as K

    groups: dict[int, list] = {}
    for gid, s, t, _, _ in user_chain_edges(d):
        groups.setdefault(gid, []).append((s, t))
    return {gid: K.build_undirected_adj(es) for gid, es in sorted(groups.items())}


# ---------------------------------------------------------------------------
# VALUES literal rendering
# ---------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)  # repr round-trips doubles exactly
    if isinstance(v, int):
        return str(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_sql(rows, cols: list[tuple[str, str]], wrap: str | None = None) -> str:
    """rows -> ``SELECT ... FROM (VALUES ...) AS t(...)``.  ``cols`` is
    [(name, duckdb_type)].  ``wrap`` optionally replaces the outer select
    list (e.g. to apply round() on the DuckDB side so rounding semantics
    match Spark's round exactly)."""
    names = ", ".join(n for n, _ in cols)
    select = wrap or names
    if not rows:
        nulls = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"SELECT {select} FROM (SELECT {nulls}) AS t WHERE FALSE"
    first = rows[0]
    head = "(" + ", ".join(
        f"CAST({_lit(v)} AS {t})" for v, (_, t) in zip(first, cols)
    ) + ")"
    rest = [
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows[1:]
    ]
    body = ",\n".join([head] + rest)
    return f"SELECT {select} FROM (VALUES\n{body}\n) AS t({names})"


def spark_round(x: float, n: int) -> float:
    """Bit-exact mirror of Spark's ``F.round`` on doubles: Spark rounds
    HALF_UP on ``BigDecimal.valueOf(double)`` — i.e. on the SHORTEST
    decimal representation (Double.toString == python repr), not on the
    exact binary expansion DuckDB's round() uses.  The two disagree on
    half-ulp ties (seen: 8.3659375 -> Spark .365938, DuckDB .365937), so
    oracles for Spark-rounded floats must pre-round with this and emit
    the literal unwrapped."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
        )
    )


def _round_wrap(cols: list[tuple[str, str]], rounds: dict[str, int]) -> str:
    parts = []
    for n, _ in cols:
        if n in rounds:
            parts.append(f"round({n}, {rounds[n]}) AS {n}")
        else:
            parts.append(n)
    return ", ".join(parts)


# ---------------------------------------------------------------------------
# kernel-oracle builders (one per driver query)
# ---------------------------------------------------------------------------


def ora_coreness(d: str) -> str:
    from .functions import kernels as K

    core = K.coreness_values(_cp_adj(d))
    return values_sql(
        sorted(core.items()), [("v", "BIGINT"), ("coreness", "INTEGER")]
    )


def ora_k_core_components(d: str, k: int) -> str:
    from .functions import kernels as K

    comps = K.k_cores(_cp_adj(d), k)
    rows = sorted((n, min(c)) for c in comps for n in c)
    return values_sql(rows, [("v", "BIGINT"), ("component", "BIGINT")])


def ora_k_truss_edges(d: str, k: int) -> str:
    from .functions import kernels as K

    trusses, _ = K.k_trusses(_cp_small_adj(d), k)
    rows = sorted(e for t in trusses for e in t)
    return values_sql(rows, [("src", "BIGINT"), ("dst", "BIGINT")])


def ora_min_degree_prune(d: str, k: int) -> str:
    from .functions import kernels as K

    removed: set = set()
    K.k_cores(_cp_small_adj(d), k, removed)
    rows = sorted(
        (s, t)
        for s, t in cp_small_edges(d)
        if s not in removed and t not in removed
    )
    return values_sql(rows, [("src", "BIGINT"), ("dst", "BIGINT")])


def _betweenness_rows(adj, sources):
    from .functions import kernels as K

    acc = {n: 0.0 for n in adj}
    for s in sources:
        for n, dep in K.brandes_single_source(adj, s).items():
            acc[n] += dep
    return sorted(acc.items())


def ora_betweenness_sampled(d: str) -> str:
    adj = _cp_adj(d)
    ranked = sorted(
        (hashlib.md5(f"{BETWEENNESS_SEED}|{v}".encode()).hexdigest(), v)
        for v in adj
    )
    sources = [v for _, v in ranked[:BETWEENNESS_SOURCES]]
    cols = [("v", "BIGINT"), ("betweenness", "DOUBLE")]
    return values_sql(
        _betweenness_rows(adj, sources),
        cols,
        wrap=_round_wrap(cols, {"betweenness": 6}),
    )


def ora_betweenness_exact(d: str) -> str:
    adj = _cp_small_adj(d)
    cols = [("v", "BIGINT"), ("betweenness", "DOUBLE")]
    return values_sql(
        _betweenness_rows(adj, sorted(adj)),
        cols,
        wrap=_round_wrap(cols, {"betweenness": 6}),
    )


def ora_eigenvector_centrality(d: str) -> str:
    from .functions import kernels as K

    ev = K.eigenvector_centrality(_cp_small_adj(d), eps=0.0, max_iter=EVCENT_ITERS)
    cols = [("v", "BIGINT"), ("evcent", "DOUBLE")]
    return values_sql(
        sorted(ev.items()), cols, wrap=_round_wrap(cols, {"evcent": 6})
    )


def ora_coreness_anomaly(d: str) -> str:
    from .functions import kernels as K

    anom = K.coreness_anomaly(_cp_adj(d))
    cols = [("v", "BIGINT"), ("anomaly", "DOUBLE")]
    return values_sql(
        sorted(anom.items()), cols, wrap=_round_wrap(cols, {"anomaly": 6})
    )


def ora_weighted_coreness(d: str) -> str:
    from .functions import kernels as K

    wadj = K.build_weighted_adj(
        [(s, t, float(w)) for s, t, w in wcp_edges(d)]
    )
    fc = K.fractional_coreness(wadj)
    cols = [("v", "BIGINT"), ("coreness", "DOUBLE")]
    return values_sql(
        sorted(fc.items()), cols, wrap=_round_wrap(cols, {"coreness": WCORE_ROUND})
    )


def ora_core_assignments_per_user(d: str) -> str:
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        for lvl, comps in enumerate(K.core_assignments(adj), start=1):
            for comp in comps:
                m = min(comp)
                for n in sorted(comp):
                    rows.append((gid, lvl, n, m))
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("level", "INTEGER"),
            ("node", "BIGINT"),
            ("component", "BIGINT"),
        ],
    )


def ora_kpeaks_per_user(d: str) -> str:
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        core = K.coreness_values(adj)
        peaks, mountains = K.k_peak_mountain_assignment(adj)
        m_of = {n: mid for mid, nodes in mountains.items() for n in nodes}
        for n in sorted(adj):
            rows.append((gid, n, core[n], peaks[n], m_of[n]))
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("node", "BIGINT"),
            ("coreness", "INTEGER"),
            ("peak", "INTEGER"),
            ("mountain", "INTEGER"),
        ],
    )


def ora_approx_stats_per_user(d: str, samples: int = 200) -> str:
    """Mirror of operators.pergraph.approx_stats_per_graph: seeded wedge
    sampling + is_connected per user chain graph.  Seed = graph id (user
    ids are numeric, so stable_graph_seed(gid) == gid)."""
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        has_wedge = any(len(nbrs) >= 2 for nbrs in adj.values())
        rows.append(
            (
                gid,
                K.is_connected(adj),
                K.approx_avg_clustering(adj, samples, int(gid))
                if has_wedge
                else None,
                K.approx_transitivity(adj, samples, int(gid))
                if has_wedge
                else None,
            )
        )
    cols = [
        ("graph_id", "BIGINT"),
        ("is_connected", "BOOLEAN"),
        ("approx_avg_clustering", "DOUBLE"),
        ("approx_transitivity", "DOUBLE"),
    ]
    return values_sql(
        rows,
        cols,
        wrap=_round_wrap(
            cols, {"approx_avg_clustering": 6, "approx_transitivity": 6}
        ),
    )


def ora_cnm_per_user(d: str) -> str:
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        communities, trace = K.cnm_communities(adj)
        label = {}
        for members in communities.values():
            m = min(members)
            for n in members:
                label[n] = m
        tr = json.dumps(trace)
        for n in sorted(label):
            rows.append((gid, n, label[n], tr))
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("node", "BIGINT"),
            ("community", "BIGINT"),
            ("modularity_trace", "VARCHAR"),
        ],
    )


def ora_brokerage_per_user(d: str, mod_k: int = 4) -> str:
    from .functions import kernels as K

    groups: dict[int, list] = {}
    for gid, s, t, _, _ in user_chain_edges(d):
        groups.setdefault(gid, []).append((s, t))
    membership = {}

    class _Mod:
        def __getitem__(self, n):
            return int(n) % mod_k

    membership = _Mod()
    rows = []
    for gid, es in sorted(groups.items()):
        out_adj, in_adj = K.build_directed_adj(es)
        for n in sorted(out_adj):
            s = K.brokerage_scores(out_adj, in_adj, n, membership)
            rows.append(
                (
                    gid, n, s["coordinator"], s["itinerant"], s["gatekeeper"],
                    s["representative"], s["liaison"], s["total_open_twopaths"],
                )
            )
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("node", "BIGINT"),
            ("coordinator", "INTEGER"),
            ("itinerant", "INTEGER"),
            ("gatekeeper", "INTEGER"),
            ("representative", "INTEGER"),
            ("liaison", "INTEGER"),
            ("total_open_twopaths", "INTEGER"),
        ],
    )


def ora_weighted_core_miner_per_user(d: str) -> str:
    from .functions import kernels as K

    groups: dict[int, list] = {}
    for gid, s, t, sts, dts in user_chain_edges(d):
        w = (float(dts) - float(sts)) / 1000.0
        groups.setdefault(gid, []).append((s, t, w))
    rows = []
    for gid, es in sorted(groups.items()):
        wadj = K.build_weighted_adj(es)
        fc = K.fractional_coreness(wadj)
        for n, c in sorted(fc.items(), key=lambda kv: (kv[1], kv[0])):
            rows.append((gid, n, c, len(wadj[n])))
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("node", "BIGINT"),
            ("frac_coreness", "DOUBLE"),
            ("degree", "INTEGER"),
        ],
    )


def ora_featurizer_per_user(d: str) -> str:
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        stats = K.graph_stats(adj, seed=int(gid))
        rows.append((gid, json.dumps(stats, sort_keys=True)))
    return values_sql(rows, [("graph_id", "BIGINT"), ("stats", "VARCHAR")])


def ora_core_miner_per_user(d: str) -> str:
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        core = K.coreness_values(adj)
        anom = K.coreness_anomaly(adj, core)
        deg = K.degrees(adj)
        for n, c in sorted(core.items(), key=lambda kv: (kv[1], kv[0])):
            rows.append((gid, n, c, deg[n], anom[n]))
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("node", "BIGINT"),
            ("coreness", "INTEGER"),
            ("degree", "INTEGER"),
            ("anomaly", "DOUBLE"),
        ],
    )


def ora_spectral_per_user(d: str) -> str:
    from .functions import kernels as K

    rows = []
    for gid, adj in _user_adjs(d).items():
        rows.append(
            (
                gid,
                len(adj),
                K.count_edges(adj),
                # + 0.0: fold -0.0 to +0.0 (DuckDB's untyped VALUES rows
                # parse -0.0 via DECIMAL and drop the sign; the Spark side
                # normalizes identically in pergraph.spectral_per_graph)
                round(float(K.algebraic_connectivity(adj)), 6) + 0.0,
            )
        )
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("n_nodes", "INTEGER"),
            ("n_edges", "INTEGER"),
            ("algebraic_connectivity", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=4)
def _clique_search(d: str):
    """Shared in-process beam search over the supplier-part bipartite
    graph (same SearchProblem as the gate queries).  Returns
    (g, top, core_type, non_core_types, n_types) or None when the search
    yields nothing conforming."""
    from .functions import clique_kernel as CK

    con = _con(d)
    pairs = con.execute(
        "SELECT DISTINCT l_suppkey, l_partkey FROM lineitem ORDER BY 1, 2"
    ).fetchall()
    rows_in = [(int(c), int(nc), "supplies", "part") for c, nc in pairs]
    typespec = [["supplier", "supplies", "part"]]
    sp = CK.SearchProblem(
        beam_size=10, alpha=1.0, global_thresh=0.5, local_thresh=0.5,
        num_to_search=10, num_epochs=30, max_repeated_prior_scores=3,
        min_degree=2,
    )
    core_type, non_core_types, _, _ = CK.process_typespec(typespec)
    n_types = len(non_core_types)
    g = CK.build_typed_graph(rows_in, typespec, min_degree=sp.min_degree)
    if not g.core_ids or not g.non_core_ids:
        return None
    beam = CK.Beam(g, sp, graph_key=0, num_non_core_types=n_types)
    top, _ = beam.run_search()
    if top.score is None or top.score <= 0:
        return None
    return g, top, core_type, non_core_types, n_types


def ora_clique_miner(d: str) -> str:
    """In-process mirror of operators.clique_miner.mine_cliques on the
    supplier-part bipartite graph (same SearchProblem as the query)."""
    cols = [
        ("graph_id", "BIGINT"), ("num_core", "INTEGER"),
        ("num_non_core", "INTEGER"), ("core_ids", "VARCHAR"),
        ("non_core_ids", "VARCHAR"), ("non_core_types", "VARCHAR"),
        ("cliqueness", "DOUBLE"), ("core_densities", "VARCHAR"),
        ("non_core_densities", "VARCHAR"),
    ]
    found = _clique_search(d)
    if found is None:
        return values_sql([], cols)
    g, top, _core_type, non_core_types, n_types = found
    rev = g.reverse_labels_map
    core_labels = sorted(rev[i][1] for i in top.core_ids)
    non_core_labels = sorted(rev[i][1] for i in top.non_core_ids)
    nct = [
        non_core_types[g.nodes[i].non_core_type - 1]
        for i in sorted(top.non_core_ids)
    ]
    row = (
        0, len(core_labels), len(non_core_labels), json.dumps(core_labels),
        json.dumps(non_core_labels), json.dumps(nct), top.get_cliqueness(),
        json.dumps(top.get_core_densities()),
        json.dumps(top.get_non_core_densities(n_types)),
    )
    return values_sql([row], cols)


def ora_clique_miner_long(d: str) -> str:
    """Long-format mirror (one row per clique node,
    transformer.rs:291-307 / candidate.rs:341-397)."""
    cols = [
        ("graph_id", "BIGINT"), ("node_id", "BIGINT"),
        ("node_type", "VARCHAR"),
    ]
    found = _clique_search(d)
    if found is None:
        return values_sql([], cols)
    g, top, core_type, non_core_types, _n_types = found
    rev = g.reverse_labels_map
    rows = [(0, int(c), core_type) for c in sorted(rev[i][1] for i in top.core_ids)]
    by_label = {
        rev[i][1]: non_core_types[g.nodes[i].non_core_type - 1]
        for i in top.non_core_ids
    }
    rows += [(0, int(nc), by_label[nc]) for nc in sorted(by_label)]
    return values_sql(rows, cols)


def ora_ann_recall(d: str, k: int = 10, n_planes: int = 3,
                   n_tables: int = 16, seed: int = 42) -> str:
    """numpy mirror of functions.similarity.ann_recall on the embeddings
    table (queries = vec_id < 8), using the same seeded hyperplanes."""
    import numpy as np

    from .functions.similarity import lsh_planes

    con = _con(d)
    data = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data], dtype=np.int64)
    mat = np.array([r[1] for r in data], dtype=np.float64)
    dim = mat.shape[1]
    qmask = ids < 8
    norms = np.sqrt((mat * mat).sum(axis=1))

    def topk_exact(qi):
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-cos[i], ids[i]),
        )
        return [ids[i] for i in order[:k]]

    # bucket tables
    buckets = []
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    for t in range(n_tables):
        planes = lsh_planes(dim, n_planes, seed, t)
        bits = (mat @ planes) > 0
        buckets.append(bits @ weights)
    rows = []
    for qi in np.nonzero(qmask)[0]:
        exact = set(topk_exact(qi))
        cand = set()
        for t in range(n_tables):
            same = np.nonzero(buckets[t] == buckets[t][qi])[0]
            cand.update(int(i) for i in same)
        cand.discard(int(qi))
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(cand, key=lambda i: (-cos[i], ids[i]))
        approx = {ids[i] for i in order[:k]}
        rows.append((int(ids[qi]), len(exact & approx) / float(k)))
    cols = [("query_id", "BIGINT"), ("recall", "DOUBLE")]
    return values_sql(rows, cols, wrap=_round_wrap(cols, {"recall": 6}))


def _clustered_matrix(n, dim, n_clusters, sigma, seed):
    """numpy mirror of similarity.synthesize_clustered_embeddings — same
    rng streams, same float32 quantization."""
    import numpy as np

    mat32 = np.empty((n, dim), dtype=np.float32)
    for i in range(n):
        c = i % n_clusters
        center = np.random.default_rng(seed * 1_000_003 + c).standard_normal(dim)
        center /= np.linalg.norm(center)
        noise = np.random.default_rng(seed * 2_000_003 + i).standard_normal(dim)
        mat32[i] = (center + sigma * noise).astype(np.float32)
    return mat32.astype(np.float64)


def ora_embedding_near_dups(
    d: str,
    n: int = 600,
    dim: int = 32,
    n_clusters: int = 30,
    sigma: float = 0.05,
    seed: int = 11,
    threshold: float = 0.9,
    n_planes: int = 10,
    n_tables: int = 16,
    lsh_seed: int = 42,
) -> str:
    """numpy mirror of dedup.embedding_near_duplicates (LSH path) on the
    clustered fixture: same bucket tables, same cosine >= threshold
    re-check."""
    import numpy as np

    from .functions.similarity import lsh_planes

    mat = _clustered_matrix(n, dim, n_clusters, sigma, seed)
    norms = np.sqrt((mat * mat).sum(axis=1))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    pairs: set = set()
    for t in range(n_tables):
        planes = lsh_planes(dim, n_planes, lsh_seed, t)
        b = ((mat @ planes) > 0) @ weights
        order = {}
        for i, bk in enumerate(b):
            order.setdefault(int(bk), []).append(i)
        for members in order.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    pairs.add((members[x], members[y]))
    rows = []
    for a, bb in sorted(pairs):
        cos = float(mat[a] @ mat[bb] / (norms[a] * norms[bb]))
        # filter on the RAW cosine, round only for output — same order of
        # operations as the Spark side
        if cos >= threshold:
            rows.append((a, bb, round(cos, 6)))
    cols = [("vec_a", "BIGINT"), ("vec_b", "BIGINT"), ("cosine", "DOUBLE")]
    return values_sql(rows, cols, wrap=_round_wrap(cols, {"cosine": 6}))


def ora_wav_feature_stats(
    d: str,
    n: int = 300,
    seed: int = 42,
    sample_rate: int = 8000,
    n_samples: int = 1600,
) -> str:
    """Expected output of multimodal.wav_feature_stats over
    synthesize_wav_media(n, seed): the SAMPLES are regenerated directly
    (same sine math, same int16 quantization) and the features computed
    from them — deliberately skipping the RIFF/WAVE container, so a gate
    match proves the Spark side's stdlib encode -> decode round trip is
    lossless."""
    import numpy as np

    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    rows = []
    for i in range(n):
        freq = 100.0 + (i * 37 + seed) % 900
        amp = 0.25 + ((i * 13 + seed) % 50) / 100.0
        x = (
            (amp * np.sin(2 * np.pi * freq * t) * 32767.0)
            .astype("<i2")
            .astype(np.float64)
            / 32768.0
        )
        rms = float(np.sqrt((x * x).mean()))
        peak = float(np.abs(x).max())
        zc = int(((x[:-1] * x[1:]) < 0).sum())
        rows.append((i, n_samples, sample_rate, rms, peak, zc))
    cols = [
        ("media_id", "BIGINT"),
        ("n_samples", "INTEGER"),
        ("sample_rate", "INTEGER"),
        ("rms", "DOUBLE"),
        ("peak", "DOUBLE"),
        ("zero_crossings", "INTEGER"),
    ]
    return values_sql(
        rows, cols, wrap=_round_wrap(cols, {"rms": 6, "peak": 6})
    )


def ora_image_feature_stats(
    d: str, n: int = 300, seed: int = 42, width: int = 32, height: int = 24
) -> str:
    """Expected output of multimodal.image_feature_stats over
    synthesize_bmp_media(n, seed): the PIXELS are regenerated directly
    (same gradient math) and the features computed from them —
    deliberately skipping the BMP container, so a gate match proves the
    Spark side's stdlib encode -> decode round trip is lossless."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    rows = []
    for i in range(n):
        rgb = np.stack(
            [
                (xs * 7 + i * 13 + seed) % 256,
                (ys * 11 + i * 17 + seed) % 256,
                ((xs + ys) * 5 + i * 19 + seed) % 256,
            ],
            axis=-1,
        ).astype(np.float64)
        luma = (
            0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        )
        # pre-round with spark_round (mirrors F.round's HALF_UP on the
        # shortest repr) and emit unwrapped literals: means are k/768
        # values, so decimal-half ties occur and DuckDB's round() on the
        # exact binary disagrees on half-ulp ties (same hazard the video
        # oracle documents with 8.3659375 -> .365938 vs .365937)
        rows.append(
            (
                i,
                width,
                height,
                spark_round(float(rgb[:, :, 0].mean()), 6),
                spark_round(float(rgb[:, :, 1].mean()), 6),
                spark_round(float(rgb[:, :, 2].mean()), 6),
                spark_round(float(luma.mean()), 6),
                spark_round(float(luma.std()), 6),
            )
        )
    cols = [
        ("media_id", "BIGINT"),
        ("width", "INTEGER"),
        ("height", "INTEGER"),
        ("mean_r", "DOUBLE"),
        ("mean_g", "DOUBLE"),
        ("mean_b", "DOUBLE"),
        ("luma_mean", "DOUBLE"),
        ("luma_std", "DOUBLE"),
    ]
    return values_sql(rows, cols)


def ora_video_feature_stats(
    d: str,
    n: int = 200,
    seed: int = 42,
    width: int = 32,
    height: int = 24,
    n_frames: int = 8,
) -> str:
    """Expected output of multimodal.video_feature_stats over
    synthesize_avi_media(n, seed): frames regenerated directly (same
    gradient-pan math), features computed from them — skipping the AVI
    container, so a gate match proves the RIFF encode -> decode round
    trip is lossless."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    rows = []
    for i in range(n):
        frames = np.stack(
            [
                np.stack(
                    [
                        (xs * 7 + i * 13 + t * 3 + seed) % 256,
                        (ys * 11 + i * 17 + t * 5 + seed) % 256,
                        ((xs + ys) * 5 + i * 19 + t * 7 + seed) % 256,
                    ],
                    axis=-1,
                )
                for t in range(n_frames)
            ]
        ).astype(np.float64)
        luma = (
            0.299 * frames[:, :, :, 0]
            + 0.587 * frames[:, :, :, 1]
            + 0.114 * frames[:, :, :, 2]
        )
        motion = float(np.abs(luma[1:] - luma[:-1]).mean())
        rows.append(
            (
                i,
                n_frames,
                width,
                height,
                spark_round(float(luma.mean()), 6),
                spark_round(motion, 6),
            )
        )
    cols = [
        ("media_id", "BIGINT"),
        ("n_frames", "INTEGER"),
        ("width", "INTEGER"),
        ("height", "INTEGER"),
        ("luma_mean", "DOUBLE"),
        ("motion", "DOUBLE"),
    ]
    return values_sql(rows, cols)


def ora_ann_clustered(
    d: str,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 50,
    sigma: float = 0.05,
    seed: int = 7,
    n_queries: int = 16,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 16,
    lsh_seed: int = 42,
) -> str:
    """numpy mirror of similarity.synthesize_clustered_embeddings +
    ann_recall_stats: regenerates the exact float32 fixture bytes from the
    (seed, cluster)/(seed, vec_id) rng streams, then computes per-query
    recall@k and candidate fraction with the same seeded hyperplanes."""
    import numpy as np

    from .functions.similarity import lsh_planes

    mat32 = np.empty((n, dim), dtype=np.float32)
    for i in range(n):
        c = i % n_clusters
        center = np.random.default_rng(seed * 1_000_003 + c).standard_normal(dim)
        center /= np.linalg.norm(center)
        noise = np.random.default_rng(seed * 2_000_003 + i).standard_normal(dim)
        mat32[i] = (center + sigma * noise).astype(np.float32)
    mat = mat32.astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = []
    for t in range(n_tables):
        planes = lsh_planes(dim, n_planes, lsh_seed, t)
        buckets.append(((mat @ planes) > 0) @ weights)
    rows = []
    for qi in range(n_queries):
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(
            (i for i in range(n) if i != qi), key=lambda i: (-cos[i], i)
        )
        exact = set(order[:k])
        cand: set = set()
        for t in range(n_tables):
            cand.update(int(i) for i in np.nonzero(buckets[t] == buckets[t][qi])[0])
        cand.discard(qi)
        approx = set(sorted(cand, key=lambda i: (-cos[i], i))[:k])
        rows.append(
            (qi, len(exact & approx) / float(k), len(cand) / float(n - 1))
        )
    cols = [
        ("query_id", "BIGINT"),
        ("recall", "DOUBLE"),
        ("cand_fraction", "DOUBLE"),
    ]
    return values_sql(
        rows, cols, wrap=_round_wrap(cols, {"recall": 6, "cand_fraction": 6})
    )


def ora_ivf_clustered(
    d: str,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 50,
    sigma: float = 0.05,
    seed: int = 7,
    n_queries: int = 16,
    k: int = 10,
    n_centroids: int = 50,
    n_probe: int = 3,
    n_iters: int = 10,
    train_limit: int = 4096,
) -> str:
    """numpy mirror of similarity.ivf_recall_stats: regenerates the exact
    float32 fixture, trains the SAME coarse quantizer via the shared
    kmeans_centroids/ivf_probe_cids helpers (quantized-dot decisions are
    identical by construction), and computes per-query recall@k and
    candidate fraction."""
    import numpy as np

    from .functions.similarity import ivf_probe_cids, kmeans_centroids

    mat32 = np.empty((n, dim), dtype=np.float32)
    for i in range(n):
        c = i % n_clusters
        center = np.random.default_rng(seed * 1_000_003 + c).standard_normal(dim)
        center /= np.linalg.norm(center)
        noise = np.random.default_rng(seed * 2_000_003 + i).standard_normal(dim)
        mat32[i] = (center + sigma * noise).astype(np.float32)
    mat = mat32.astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    cent = kmeans_centroids(mat[:train_limit], n_centroids, n_iters)
    cell = ivf_probe_cids(mat, cent, 1)[:, 0]
    probes = ivf_probe_cids(mat[:n_queries], cent, n_probe)
    rows = []
    for qi in range(n_queries):
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(
            (i for i in range(n) if i != qi), key=lambda i: (-cos[i], i)
        )
        exact = set(order[:k])
        probe_set = {int(c) for c in probes[qi]}
        cand = {i for i in range(n) if int(cell[i]) in probe_set and i != qi}
        approx = set(sorted(cand, key=lambda i: (-cos[i], i))[:k])
        rows.append(
            (qi, len(exact & approx) / float(k), len(cand) / float(n - 1))
        )
    cols = [
        ("query_id", "BIGINT"),
        ("recall", "DOUBLE"),
        ("cand_fraction", "DOUBLE"),
    ]
    return values_sql(
        rows, cols, wrap=_round_wrap(cols, {"recall": 6, "cand_fraction": 6})
    )


def ora_media_feature_stats(d: str, seed: int = 42, dim: int = 8) -> str:
    """In-process mirror of the REAL-codec mixed-format gate: 150 BMP +
    150 PNG images, 100 PCM WAVs, 100 DIB AVIs (disjoint id ranges,
    matching the entry query's synthesizer params), featurized as ``dim``
    chunk means over the decoded sample stream.  The CONTENT is
    regenerated directly (same gradient / sine / pan math, same int16
    quantization) without ever touching a container, so a gate match
    proves all four stdlib encode -> decode round trips are lossless —
    including PNG's deflate + scanline-filter inverse."""
    import numpy as np

    from .functions.multimodal import chunk_means

    width, height = 32, 24
    ys, xs = np.mgrid[0:height, 0:width]

    def gradient_luma(i: int, t: int = 0) -> "np.ndarray":
        rgb = np.stack(
            [
                (xs * 7 + i * 13 + t * 3 + seed) % 256,
                (ys * 11 + i * 17 + t * 5 + seed) % 256,
                ((xs + ys) * 5 + i * 19 + t * 7 + seed) % 256,
            ],
            axis=-1,
        ).astype(np.float64)
        return (
            0.299 * rgb[:, :, 0]
            + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]
        ).reshape(-1)

    rows = []
    for i in range(500):
        if i < 150:  # BMP: static gradient (t folds to 0 terms)
            kind, stream = "image_bmp", gradient_luma(i)
        elif i < 300:  # PNG: same pixel math, compressed container
            kind, stream = "image_png", gradient_luma(i)
        elif i < 400:  # WAV: sine tone, int16-quantized like the encoder
            kind = "audio_wav"
            t = np.arange(1600, dtype=np.float64) / 8000
            freq = 100.0 + (i * 37 + seed) % 900
            amp = 0.25 + ((i * 13 + seed) % 50) / 100.0
            stream = (
                (amp * np.sin(2 * np.pi * freq * t) * 32767.0)
                .astype("<i2")
                .astype(np.float64)
                / 32768.0
            )
        else:  # AVI: 4 panned gradient frames, luma over (frame, y, x)
            kind = "video_avi"
            stream = np.concatenate(
                [gradient_luma(i, t) for t in range(4)]
            )
        feat = chunk_means(stream, dim)
        acc = 0.0
        for x in feat:  # left-to-right like Spark's F.aggregate
            acc += float(x)
        # pre-round with spark_round + emit unwrapped (half-ulp-tie hazard
        # documented at spark_round)
        rows.append((i, kind, spark_round(acc / dim, 5)))
    cols = [("media_id", "BIGINT"), ("kind", "VARCHAR"), ("feat_mean", "DOUBLE")]
    return values_sql(rows, cols)


def ora_anf(d: str, rounds: int = 3, k: int = 4) -> str:
    """Sequential FM-sketch oracle for graph_anf_sketch_t3 — identical
    md5-seeded registers, OR-merged over the same copurchase adjacency
    (operators/anf.py holds the literature citations)."""
    from .functions import kernels as K

    st = K.anf_sketches(_cp_adj(d), rounds, k)
    rows = sorted((v, *regs) for v, regs in st.items())
    return values_sql(
        rows,
        [("v", "BIGINT")] + [(f"r{i}", "BIGINT") for i in range(k)],
    )


def host_graph_pages(d: str) -> int:
    """Page count for the web_host_graph gate at a given sf dir — scales
    10x with the gate scale like the on-disk tables do."""
    return 40000 if d.rstrip("/").endswith("sf0.1") else 4000


def page_targets(i: int, n_pages: int, n_hubs: int = 16,
                 seed: int = 7) -> list:
    """Pure-python replication of sources.pages.synthesize_pages' link
    arithmetic (pages.py:45-60) for one page: the ordered, deduped,
    self-link-free outlink target list embedded in page i's html."""
    hub = (i * 31 + seed) % n_hubs
    kk = (i * (seed + 13)) % 7 + 1
    raw = [hub] + [
        (i * 2654435761 + (j + 1) * 40503 + seed * 7919) % n_pages
        for j in range(1, kk + 1)
    ]
    seen: set = set()
    targets = []
    for t in raw:  # array_union: first-occurrence order, deduped
        if t not in seen and t != i:
            seen.add(t)
            targets.append(t)
    return targets


def host_rollup_rows(n_pages: int, n_sites: int = 53, n_hubs: int = 16,
                     seed: int = 7) -> list:
    """Expected host-level rollup of the synthesized page graph — the
    Spark side must parse the SAME targets back out of the html bytes
    (the byte-identical extraction invariant) to hash-match this."""
    from collections import defaultdict

    links: dict = defaultdict(int)
    srcs: dict = defaultdict(set)
    for i in range(n_pages):
        sh = f"site{i % n_sites}.test"
        for t in page_targets(i, n_pages, n_hubs, seed):
            dh = f"site{t % n_sites}.test"
            links[(sh, dh)] += 1
            srcs[(sh, dh)].add(i)
    return sorted(
        (sh, dh, c, len(srcs[(sh, dh)])) for (sh, dh), c in links.items()
    )


def ora_host_graph(d: str) -> str:
    return values_sql(
        host_rollup_rows(host_graph_pages(d)),
        [
            ("src_host", "VARCHAR"),
            ("dst_host", "VARCHAR"),
            ("links", "BIGINT"),
            ("src_pages", "BIGINT"),
        ],
    )


def ora_link_reciprocity(d: str, n_hubs: int = 16, seed: int = 7) -> str:
    """Exact reciprocity of the synthesized directed page-link graph
    (operators/graphstats.py reciprocity over edges_from_extracted)."""
    n_pages = host_graph_pages(d)
    edges = {
        (i, t)
        for i in range(n_pages)
        for t in page_targets(i, n_pages, n_hubs, seed)
    }
    n = len(edges)
    r = sum(1 for (i, t) in edges if (t, i) in edges)
    return values_sql(
        [(n, r, r / n)],
        [
            ("n_edges", "BIGINT"),
            ("n_reciprocal", "BIGINT"),
            ("reciprocity", "DOUBLE"),
        ],
    )


def ora_host_rank(d: str, iters: int = 5) -> str:
    """Weighted-PageRank mirror over the expected host edges (same
    recursive-CTE pattern as the page-level pagerank oracle; weights =
    host-pair link counts from host_rollup_rows)."""
    rows = host_rollup_rows(host_graph_pages(d))
    hedges = ",\n".join(
        f"('{sh}', '{dh}', {c})" for sh, dh, c, _ in rows
    )
    it = """
pr{k} AS (
  SELECT verts.v, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.m, 0) AS r
  FROM verts LEFT JOIN (
    SELECT he.dst AS v, sum(pr{j}.r * (he.w / outw.d)) AS m
    FROM hedges he JOIN pr{j} ON he.src = pr{j}.v
                   JOIN outw ON he.src = outw.src
    GROUP BY he.dst
  ) s ON verts.v = s.v
)"""
    chain = ",".join(it.format(k=k, j=k - 1) for k in range(1, iters + 1))
    return f"""
WITH hedges(src, dst, w) AS (VALUES
{hedges}
),
verts AS (SELECT DISTINCT v FROM (
  SELECT src AS v FROM hedges UNION SELECT dst FROM hedges)),
n AS (SELECT count(*) AS c FROM verts),
outw AS (SELECT src, sum(w) AS d FROM hedges GROUP BY src),
pr0 AS (SELECT v, 1.0 / (SELECT c FROM n) AS r FROM verts),
{chain}
SELECT v AS host, round(r, 6) AS host_rank FROM pr{iters}"""


def ora_page_hits(d: str, iters: int = 8, n_sites: int = 53,
                  n_hubs: int = 16, seed: int = 7) -> str:
    """Sequential HITS oracle over the synthesized page-link digraph
    (operators/hits.py): kernels.hits on the page_targets edge set, vertex
    ids mapped back to urls with the same site/page url arithmetic the
    Spark side synthesizes (pages.py:_url_for)."""
    from .functions import kernels as K

    n_pages = host_graph_pages(d)
    edges = [
        (i, t)
        for i in range(n_pages)
        for t in page_targets(i, n_pages, n_hubs, seed)
    ]
    hv = K.hits(edges, max_iter=iters)
    rows = sorted(
        (
            f"https://site{v % n_sites}.test/page{v}",
            spark_round(h, 6),
            spark_round(a, 6),
        )
        for v, (h, a) in hv.items()
    )
    return values_sql(
        rows,
        [("url", "VARCHAR"), ("hub", "DOUBLE"), ("authority", "DOUBLE")],
    )


def ora_anf_nf(d: str, rounds: int = 3, k: int = 4) -> str:
    """Sequential neighborhood-function oracle for
    graph_anf_neighborhood_fn — same FM registers as ora_anf, summed with
    the same FM correction per round, same driver-side 3-decimal rounding
    before the frac ratio (operators/anf.py:anf_neighborhood_function)."""
    from .functions import kernels as K

    adj = _cp_adj(d)
    totals = []
    for t in range(rounds + 1):
        st = K.anf_sketches(adj, t, k)
        totals.append(
            round(sum(K.anf_estimate(regs) for regs in st.values()), 3)
        )
    last = totals[-1]
    return values_sql(
        [(t, tot, round(tot / last, 6)) for t, tot in enumerate(totals)],
        [("t", "INTEGER"), ("nf_total", "DOUBLE"), ("frac", "DOUBLE")],
    )


def ora_adamic_adar(d: str, min_common: int = 2) -> str:
    """Sequential Adamic-Adar oracle over the small copurchase subgraph
    (operators/linkpred.py): kernels.adamic_adar on the same adjacency."""
    from .functions import kernels as K

    aa = K.adamic_adar(_cp_small_adj(d), min_common=min_common)
    rows = sorted((u, v, c, s) for (u, v), (c, s) in aa.items())
    return values_sql(
        rows,
        [
            ("u", "BIGINT"),
            ("v", "BIGINT"),
            ("common_neighbors", "BIGINT"),
            ("aa_score", "DOUBLE"),
        ],
    )


def ora_host_trustrank(d: str, iters: int = 5, n_seeds: int = 16) -> str:
    """TrustRank mirror of ora_host_rank: same weighted host edges, but
    the start vector, the 0.15 restart, and (structurally absent here —
    every host has out-links) the dangling mass all flow to the hub-host
    seed vector instead of uniform 1/n, matching pagerank(teleport=...)
    semantics (operators/pagerank.py:87-94)."""
    rows = host_rollup_rows(host_graph_pages(d))
    hedges = ",\n".join(
        f"('{sh}', '{dh}', {c})" for sh, dh, c, _ in rows
    )
    seeds = ",".join(f"('site{i}.test')" for i in range(n_seeds))
    it = """
pr{k} AS (
  SELECT verts.v,
         0.15 * coalesce(sd.p, 0) + 0.85 * coalesce(s.m, 0) AS r
  FROM verts
  LEFT JOIN seedp sd ON verts.v = sd.v
  LEFT JOIN (
    SELECT he.dst AS v, sum(pr{j}.r * (he.w / outw.d)) AS m
    FROM hedges he JOIN pr{j} ON he.src = pr{j}.v
                   JOIN outw ON he.src = outw.src
    GROUP BY he.dst
  ) s ON verts.v = s.v
)"""
    chain = ",".join(it.format(k=k, j=k - 1) for k in range(1, iters + 1))
    return f"""
WITH hedges(src, dst, w) AS (VALUES
{hedges}
),
seeds(v) AS (VALUES {seeds}),
seedp AS (SELECT v, 1.0 / {n_seeds} AS p FROM seeds),
verts AS (SELECT DISTINCT v FROM (
  SELECT src AS v FROM hedges UNION SELECT dst FROM hedges)),
outw AS (SELECT src, sum(w) AS d FROM hedges GROUP BY src),
pr0 AS (SELECT verts.v, coalesce(sd.p, 0) AS r
        FROM verts LEFT JOIN seedp sd ON verts.v = sd.v),
{chain}
SELECT v AS host, round(r, 6) AS trust_rank FROM pr{iters}"""


def ora_harmonic_sampled(d: str, max_sources: int = 100, seed: int = 0) -> str:
    """Sequential harmonic-centrality oracle for
    graph_harmonic_centrality_sampled: the shared deterministic
    md5(seed|v) source sample (centrality.sample_sources_py convention),
    BFS per source, fixed-order 1/d accumulation bit-identical to the
    distributed pivot expression (operators/centrality.py)."""
    from .functions import kernels as K

    adj = _cp_adj(d)
    ranked = sorted(
        (hashlib.md5(f"{seed}|{v}".encode()).hexdigest(), v) for v in adj
    )
    sources = [v for _, v in ranked[:max_sources]]
    h = K.harmonic_centrality(adj, sources)
    return values_sql(
        sorted((v, spark_round(x, 6)) for v, x in h.items()),
        [("v", "BIGINT"), ("harmonic", "DOUBLE")],
    )


def ora_anf_effective_diameter(
    d: str, q: float = 0.9, rounds: int = 3, k: int = 4
) -> str:
    """Effective-diameter oracle for graph_anf_effective_diameter: the
    same FM register totals as ora_anf_nf, fed through the SAME
    interpolation code path the operator runs
    (operators.anf.effective_diameter_from_totals — pure driver-side
    python on both sides, so divergence is structurally impossible)."""
    from .functions import kernels as K
    from .operators.anf import effective_diameter_from_totals

    adj = _cp_adj(d)
    totals = []
    for t in range(rounds + 1):
        st = K.anf_sketches(adj, t, k)
        totals.append(
            round(sum(K.anf_estimate(regs) for regs in st.values()), 3)
        )
    t_hit, eff = effective_diameter_from_totals(totals, q)
    return values_sql(
        [(float(q), t_hit, eff)],
        [("q", "DOUBLE"), ("t_hit", "INTEGER"), ("eff_diameter", "DOUBLE")],
    )


def ora_web_bowtie(d: str, n_sites: int = 53, n_hubs: int = 16,
                   seed: int = 7) -> str:
    """Bow-tie oracle for web_bowtie_structure: the synthesized page
    digraph restricted to band-ascending edges (outer bands are internal
    DAGs, the middle band keeps its random structure — the rule the Spark
    side applies in SQL over the EXTRACTED edges), classified by
    kernels.bowtie (true-SCC Tarjan + BFS reach sets)."""
    from .functions import kernels as K

    n = host_graph_pages(d)
    q1, q3 = n // 4, 3 * n // 4

    def band(v: int) -> int:
        return 0 if v < q1 else (1 if v < q3 else 2)

    kept = []
    for i in range(n):
        bu = band(i)
        for t in page_targets(i, n, n_hubs, seed):
            bv = band(t)
            if bu <= bv and ((bu == 1 and bv == 1) or i < t or bu != bv):
                kept.append((i, t))
    cats = K.bowtie(kept)
    return values_sql(
        sorted(cats.items()), [("v", "BIGINT"), ("category", "VARCHAR")]
    )


def ora_anf_harmonic(d: str, rounds: int = 3, k: int = 4) -> str:
    """HyperBall-harmonic oracle for graph_anf_harmonic_centrality —
    kernels.anf_harmonic over the copurchase adjacency, spark_round()ed
    literals (operators/anf.py:anf_harmonic_centrality)."""
    from .functions import kernels as K

    h = K.anf_harmonic(_cp_adj(d), rounds, k)
    return values_sql(
        sorted((v, spark_round(x, 6)) for v, x in h.items()),
        [("v", "BIGINT"), ("harmonic_est", "DOUBLE")],
    )


_EVENT_DAG_Q = """
SELECT src, dst FROM (
  SELECT event_id AS src, lead(event_id, 1) OVER w AS dst FROM events
  WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id)
  UNION ALL
  SELECT event_id AS src, lead(event_id, 2) OVER w2 AS dst FROM events
  WINDOW w2 AS (PARTITION BY user_id, date_trunc('day', ts)
                ORDER BY ts, event_id)
) WHERE dst IS NOT NULL
"""


@lru_cache(maxsize=4)
def event_dag_edges(d: str) -> tuple:
    """Mirror of __spark_entry__.event_dag_edges: per-(user, day) event
    chains with skip-1 AND skip-2 succession edges — a diamond-laden DAG
    whose depth is the max chain length (~10 at sf0.01)."""
    return tuple(_con(d).execute(_EVENT_DAG_Q).fetchall())


def ora_mst_forest(d: str) -> str:
    """Sequential Kruskal oracle for graph_mst_forest
    (operators/mst.py): same (weight, src, dst) total order, so the
    unique minimum spanning forest matches the distributed Boruvka
    edge-for-edge."""
    from .functions import kernels as K

    forest = K.kruskal_msf([(s, t, float(w)) for s, t, w in wcp_edges(d)])
    return values_sql(
        forest, [("src", "BIGINT"), ("dst", "BIGINT"), ("weight", "DOUBLE")]
    )


def ora_topo_levels(d: str) -> str:
    """Sequential Kahn oracle for graph_topological_levels
    (operators/dag.py) over the event diamond DAG."""
    from .functions import kernels as K

    levels = K.kahn_levels(event_dag_edges(d))
    return values_sql(
        sorted(levels.items()), [("v", "BIGINT"), ("level", "INTEGER")]
    )


def ora_random_walks(d: str, walks: int = 2, length: int = 4,
                     seed: int = 0) -> str:
    """Sequential deterministic-walk oracle for graph_random_walks
    (operators/walks.py): kernels.seeded_walks reproduces the md5
    neighbor picks over the same sorted adjacency."""
    from .functions import kernels as K

    rows = sorted(K.seeded_walks(_cp_small_adj(d), walks, length, seed))
    return values_sql(
        rows,
        [("start", "BIGINT"), ("walk", "INTEGER"), ("step", "INTEGER"),
         ("v", "BIGINT")],
    )


def ora_luby_mis(d: str, seed: int = 0) -> str:
    """Sequential Luby oracle for graph_luby_mis (operators/mis.py):
    kernels.luby_mis reproduces the md5 per-round priorities over the
    same copurchase adjacency, so members and join rounds match the
    distributed output exactly."""
    from .functions import kernels as K

    mis = K.luby_mis(_cp_adj(d), seed=seed)
    return values_sql(
        sorted(mis.items()), [("v", "BIGINT"), ("mis_round", "INTEGER")]
    )


def ora_gopher_repetition(d: str) -> str:
    """Pure-python mirror of textops.gopher_repetition over the same
    documents: whitespace tokenization, occurrence-weighted n-gram char
    coverage, spark_round()ed ratios (see that docstring for the
    definition both sides pin)."""
    import re

    rows = []
    for doc_id, text in _con(d).execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall():
        ns_chars = len(re.sub(r"\s+", "", text or ""))
        toks = [t for t in re.split(r"\s+", (text or "").strip()) if t]
        fracs = {}
        for n in (2, 3, 5):
            counts: dict[str, int] = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                counts[g] = counts.get(g, 0) + 1
            if counts:
                # (count DESC, gram ASC) — min over (-cnt, gram)
                nc, top = min((-c, g) for g, c in counts.items())
                top_chars = (-nc) * len(top.replace(" ", ""))
            else:
                top_chars = 0
            dup_chars = sum(
                c * len(g.replace(" ", ""))
                for g, c in counts.items()
                if c >= 2
            )
            fracs[n] = (top_chars, dup_chars)
        denom = max(ns_chars, 1)
        rows.append(
            (
                doc_id,
                spark_round(fracs[2][0] / denom, 6),
                spark_round(fracs[3][0] / denom, 6),
                spark_round(fracs[5][1] / denom, 6),
            )
        )
    return values_sql(
        rows,
        [
            ("doc_id", "BIGINT"),
            ("top_2gram_frac", "DOUBLE"),
            ("top_3gram_frac", "DOUBLE"),
            ("dup_5gram_frac", "DOUBLE"),
        ],
    )


def ora_node2vec_walks(d: str, walks: int = 1, length: int = 4,
                       p: float = 2.0, q: float = 0.5,
                       seed: int = 0) -> str:
    """Sequential mirror oracle for graph_node2vec_walks
    (operators/walks.py:node2vec_walks): kernels.node2vec_seeded_walks
    reproduces the uniform step 1 and the inverse-CDF biased picks with
    the identical fixed-order float fold."""
    from .functions import kernels as K

    rows = sorted(
        K.node2vec_seeded_walks(_cp_small_adj(d), walks, length, p, q, seed)
    )
    return values_sql(
        rows,
        [("start", "BIGINT"), ("walk", "INTEGER"), ("step", "INTEGER"),
         ("v", "BIGINT")],
    )


def ora_trussness(d: str) -> str:
    """Sequential truss-decomposition oracle for graph_trussness
    (operators/coreness.py:trussness) over the small copurchase
    subgraph."""
    from .functions import kernels as K

    t = K.trussness(_cp_small_adj(d))
    rows = sorted((a, b, v) for (a, b), v in t.items())
    return values_sql(
        rows, [("src", "BIGINT"), ("dst", "BIGINT"), ("trussness", "INTEGER")]
    )


def ora_sssp_weighted(d: str) -> str:
    """Sequential Bellman-Ford oracle for graph_sssp_weighted
    (operators/sssp.py): kernels.bellman_ford_rounds mirrors the
    round-synchronous relaxation exactly, so dist AND hops (the round a
    vertex's label was finalized) match the distributed output.
    Integer-valued weights make every distance exact in double."""
    from .functions import kernels as K

    triples = [(s, t, float(w)) for s, t, w in wcp_edges(d)]
    sym = triples + [(t, s, w) for s, t, w in triples]
    source = min(s for s, _, _ in triples)
    state = K.bellman_ford_rounds(sym, source)
    rows = sorted((v, dist, hops) for v, (dist, hops) in state.items())
    return values_sql(
        rows, [("v", "BIGINT"), ("dist", "DOUBLE"), ("hops", "INTEGER")]
    )


# in-day succession chain UNION in-day same-type succession: chords over
# the per-user chains create cycles, so biconnectivity is non-trivial
# (pure chains would make every internal vertex a cut vertex)
_USER_CYCLIC_Q = """
SELECT user_id AS graph_id, src, dst FROM (
  SELECT user_id, event_id AS src, lead(event_id) OVER w AS dst
  FROM events
  WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id)
) WHERE dst IS NOT NULL
UNION ALL
SELECT user_id AS graph_id, src, dst FROM (
  SELECT user_id, event_id AS src, lead(event_id) OVER w2 AS dst
  FROM events
  WINDOW w2 AS (PARTITION BY user_id, date_trunc('day', ts), event_type
                ORDER BY ts, event_id)
) WHERE dst IS NOT NULL
"""


@lru_cache(maxsize=4)
def user_cyclic_edges(d: str) -> tuple:
    return tuple(_con(d).execute(_USER_CYCLIC_Q).fetchall())


def ora_biconnectivity_per_user(d: str) -> str:
    """Kernel mirror of pergraph.biconnectivity_per_graph over the cyclic
    per-user fixture (Tarjan articulation points + bridges)."""
    from .functions import kernels as K

    groups: dict[int, list] = {}
    for gid, s, t in user_cyclic_edges(d):
        groups.setdefault(gid, []).append((s, t))
    rows = []
    for gid, es in sorted(groups.items()):
        adj = K.build_undirected_adj(es)
        cuts, bridges = K.cut_vertices_and_bridges(adj)
        binc: dict = {}
        for a, b in bridges:
            binc[a] = binc.get(a, 0) + 1
            binc[b] = binc.get(b, 0) + 1
        for n in sorted(adj):
            rows.append((gid, n, n in cuts, binc.get(n, 0)))
    return values_sql(
        rows,
        [
            ("graph_id", "BIGINT"),
            ("node", "BIGINT"),
            ("is_cut", "BOOLEAN"),
            ("bridge_count", "INTEGER"),
        ],
    )


def ora_jp_coloring(d: str, seed: int = 0) -> str:
    """Kernel mirror of operators/coloring.py over the undirected
    page-link graph (page_targets arithmetic = the byte-identical
    extraction invariant): the unique Jones-Plassmann coloring under the
    seeded md5 priority."""
    from .functions import kernels as K

    n = host_graph_pages(d)
    edges = []
    for i in range(n):
        for t in page_targets(i, n):
            edges.append((i, t))
    col = K.jp_coloring(K.build_undirected_adj(edges), seed)
    rows = sorted((v, c, r) for v, (c, r) in col.items())
    return values_sql(
        rows,
        [("v", "BIGINT"), ("color", "INTEGER"), ("jp_round", "INTEGER")],
    )


def ora_url_dedup(d: str) -> str:
    """DuckDB mirror of _q_url_dedup: same deterministic variant
    generation, same canonicalization steps expressed in RE2 (no
    lookahead, so the default-port rule anchors on the '/' that every
    generated variant has)."""
    n = host_graph_pages(d)
    return f"""
WITH ids AS (SELECT range AS i FROM range(0, {n})),
base AS (
  SELECT i, 'https://site' || (i % 53) || '.test/page' || i AS url FROM ids
),
variants AS (
  SELECT url FROM base
  UNION ALL
  SELECT 'HTTPS://SITE' || (i % 53) || '.TEST/page' || i
  FROM base WHERE i % 2 = 0
  UNION ALL
  SELECT url || '?utm_source=feed&utm_campaign=sync'
  FROM base WHERE i % 3 = 0
  UNION ALL
  SELECT url || '#section-' || i FROM base WHERE i % 5 = 0
  UNION ALL
  SELECT 'https://site' || (i % 53) || '.test:443/page' || i
  FROM base WHERE i % 7 = 0
),
canon AS (
  SELECT regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lower(regexp_extract(url,
              '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
            || regexp_replace(url,
              '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
            '^(https://[^/:?#]+):443/', '\\1/'),
          '#.*$', ''),
        'utm_[^&#]*&', '', 'g'),
      '[?&]utm_[^&#]*$', ''),
    '\\?$', '') AS canonical_url
  FROM variants
)
SELECT canonical_url, count(*) AS n_variants FROM canon GROUP BY 1"""


def ora_spam_mass(d: str, iters: int = 5, n_seeds: int = 16) -> str:
    """Both rank chains (ora_host_rank + ora_host_trustrank) in one
    query; relative spam mass divides the ROUNDED ranks so both engines
    divide identical doubles, and + 0.0 folds signed zero."""
    rows = host_rollup_rows(host_graph_pages(d))
    hedges = ",\n".join(f"('{sh}', '{dh}', {c})" for sh, dh, c, _ in rows)
    seeds = ",".join(f"('site{i}.test')" for i in range(n_seeds))
    pr_it = """
pr{k} AS (
  SELECT verts.v, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.m, 0) AS r
  FROM verts LEFT JOIN (
    SELECT he.dst AS v, sum(pr{j}.r * (he.w / outw.d)) AS m
    FROM hedges he JOIN pr{j} ON he.src = pr{j}.v
                   JOIN outw ON he.src = outw.src
    GROUP BY he.dst
  ) s ON verts.v = s.v
)"""
    tr_it = """
tr{k} AS (
  SELECT verts.v,
         0.15 * coalesce(sd.p, 0) + 0.85 * coalesce(s.m, 0) AS r
  FROM verts
  LEFT JOIN seedp sd ON verts.v = sd.v
  LEFT JOIN (
    SELECT he.dst AS v, sum(tr{j}.r * (he.w / outw.d)) AS m
    FROM hedges he JOIN tr{j} ON he.src = tr{j}.v
                   JOIN outw ON he.src = outw.src
    GROUP BY he.dst
  ) s ON verts.v = s.v
)"""
    chain = ",".join(
        pr_it.format(k=k, j=k - 1) for k in range(1, iters + 1)
    ) + "," + ",".join(
        tr_it.format(k=k, j=k - 1) for k in range(1, iters + 1)
    )
    return f"""
WITH hedges(src, dst, w) AS (VALUES
{hedges}
),
verts AS (SELECT DISTINCT v FROM (
  SELECT src AS v FROM hedges UNION SELECT dst FROM hedges)),
n AS (SELECT count(*) AS c FROM verts),
outw AS (SELECT src, sum(w) AS d FROM hedges GROUP BY src),
seeds(v) AS (VALUES {seeds}),
seedp AS (SELECT v, 1.0 / {n_seeds} AS p FROM seeds),
pr0 AS (SELECT v, 1.0 / (SELECT c FROM n) AS r FROM verts),
tr0 AS (SELECT verts.v, coalesce(sd.p, 0) AS r
        FROM verts LEFT JOIN seedp sd ON verts.v = sd.v),
{chain},
ranks AS (
  SELECT pr{iters}.v, round(pr{iters}.r, 6) AS host_rank,
         round(tr{iters}.r, 6) AS trust_rank
  FROM pr{iters} JOIN tr{iters} ON pr{iters}.v = tr{iters}.v
)
SELECT v AS host, host_rank, trust_rank,
       round((host_rank - trust_rank) / host_rank, 6) + 0.0
         AS rel_spam_mass
FROM ranks"""


def ora_kmeans_assignments(d: str, k: int = 8, iters: int = 5,
                           seed: int = 0) -> str:
    """Kernel mirror of operators/kmeans.py over the embeddings table."""
    from .functions import kernels as K

    vecs = {
        i: list(v)
        for i, v in _con(d).execute(
            "SELECT vec_id, embedding FROM embeddings"
        ).fetchall()
    }
    a = K.kmeans_lloyd_int(vecs, k=k, iters=iters, seed=seed)
    rows = sorted(a.items())
    return values_sql(rows, [("vec_id", "BIGINT"), ("cluster", "INTEGER")])


def ora_pii_redaction(d: str) -> str:
    """Pure-SQL DuckDB mirror of _q_pii_redaction: same arithmetic
    fixture, same regexes (the pattern class is chosen to mean the same
    thing in RE2 and Java regex — see functions/pii.py), same
    email -> phone -> ipv4 replacement order."""
    n = host_graph_pages(d)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\d{3}-\d{3}-\d{4}"
    ipv4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    return f"""
WITH ids AS (SELECT range AS i FROM range(0, {n})),
docs AS (
  SELECT i AS doc_id,
         'doc ' || i
         || CASE WHEN i % 2 = 0 THEN ' contact user' || i || '@mail'
                 || (i % 7) || '.example for details' ELSE '' END
         || CASE WHEN i % 3 = 0 THEN ' call 555-' || (i % 900 + 100)
                 || '-' || (i % 9000 + 1000) || ' now' ELSE '' END
         || CASE WHEN i % 5 = 0 THEN ' server 10.' || (i % 256) || '.'
                 || ((i * 7) % 256) || '.' || ((i * 13) % 256) || ' up'
                 ELSE '' END AS text
  FROM ids
)
SELECT doc_id,
       len(regexp_extract_all(text, '{email}')) AS n_emails,
       len(regexp_extract_all(text, '{phone}')) AS n_phones,
       len(regexp_extract_all(
             regexp_replace(text, '{email}', '[EMAIL]', 'g'),
             '{ipv4}')) AS n_ipv4,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(text, '{email}', '[EMAIL]', 'g'),
               '{phone}', '[PHONE]', 'g'),
             '{ipv4}', '[IP]', 'g')) AS redacted_md5
FROM docs"""


def ora_line_dedup(d: str, min_docs: int = 5) -> str:
    """Pure-SQL DuckDB replay of _q_line_dedup: same fixture arithmetic,
    same exact-line >= min_docs-distinct-docs boilerplate rule, kept text
    re-joined in original line order (string_agg ORDER BY pos == Spark's
    array_sort on (pos, line) structs)."""
    n = host_graph_pages(d)
    return f"""
WITH ids AS (SELECT range AS i FROM range(0, {n})),
docs AS (
  SELECT i AS doc_id,
         concat_ws(chr(10),
           'nav home about site' || (i % 53),
           'article ' || i || ' para one ' || ((i * 7) % 1000),
           'article ' || i || ' para two ' || ((i * 13) % 1000),
           CASE WHEN i % 4 = 0 THEN 'promo banner ' || (i % 11) END,
           'copyright site' || (i % 53)) AS text
  FROM ids
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(0, len(string_split(text, chr(10))))) AS pos
  FROM docs
),
boiler AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
  ) WHERE nd >= {min_docs}
),
marked AS (
  SELECT l.doc_id, l.pos, l.line,
         (b.line IS NOT NULL) AS is_b
  FROM lines l LEFT JOIN boiler b ON l.line = b.line
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       md5(coalesce(
         string_agg(CASE WHEN NOT is_b THEN line END, chr(10)
                    ORDER BY pos),
         '')) AS kept_md5
FROM marked
GROUP BY doc_id"""


def ora_page_salsa(d: str, iters: int = 8, n_sites: int = 53,
                   n_hubs: int = 16, seed: int = 7) -> str:
    """Sequential SALSA oracle over the synthesized page-link digraph
    (operators/salsa.py): kernels.salsa on the page_targets edge set,
    vertex ids mapped back to urls (same mapping as ora_page_hits)."""
    from .functions import kernels as K

    n_pages = host_graph_pages(d)
    edges = [
        (i, t)
        for i in range(n_pages)
        for t in page_targets(i, n_pages, n_hubs, seed)
    ]
    hv = K.salsa(edges, max_iter=iters)
    rows = sorted(
        (
            f"https://site{v % n_sites}.test/page{v}",
            spark_round(h, 6),
            spark_round(a, 6),
        )
        for v, (h, a) in hv.items()
    )
    return values_sql(
        rows,
        [("url", "VARCHAR"), ("hub", "DOUBLE"), ("authority", "DOUBLE")],
    )


def ora_greedy_matching(d: str) -> str:
    """Sequential greedy-scan oracle for graph_maximal_matching
    (operators/matching.py): same static md5 edge order, so the
    lexicographically-first maximal matching matches edge-for-edge."""
    from .functions import kernels as K

    rows = K.greedy_matching(cp_small_edges(d))
    return values_sql(rows, [("a", "BIGINT"), ("b", "BIGINT")])


def anchor_index_rows(n_pages: int, n_sites: int = 53, n_hubs: int = 16,
                      seed: int = 7, k: int = 3) -> list:
    """Expected top-k incoming anchor terms per target page for the
    varied_anchors fixture (pages.py synthesize_pages): same link
    arithmetic as page_targets, anchor term = term{(i*17+t*29+seed)%40},
    ranking (n DESC, term ASC)."""
    from collections import defaultdict

    counts: dict = defaultdict(int)
    for i in range(n_pages):
        for t in page_targets(i, n_pages, n_hubs, seed):
            counts[(t, f"term{(i * 17 + t * 29 + seed) % 40}")] += 1
    per_target: dict = defaultdict(list)
    for (t, term), n in counts.items():
        per_target[t].append((term, n))
    rows = []
    for t, terms in sorted(per_target.items()):
        ranked = sorted(terms, key=lambda x: (-x[1], x[0]))[:k]
        url = f"https://site{t % n_sites}.test/page{t}"
        rows.extend(
            (url, term, n, r + 1) for r, (term, n) in enumerate(ranked)
        )
    return rows


def ora_anchor_index(d: str, k: int = 3) -> str:
    return values_sql(
        anchor_index_rows(host_graph_pages(d), k=k),
        [("url", "VARCHAR"), ("term", "VARCHAR"), ("n", "BIGINT"),
         ("rank", "INTEGER")],
    )


def ora_pq_codes(
    d: str,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 50,
    sigma: float = 0.05,
    seed: int = 7,
    m: int = 4,
    k: int = 16,
    n_iters: int = 10,
    train_limit: int = 4096,
) -> str:
    """numpy mirror of similarity.pq_codes over the clustered fixture:
    regenerates the exact float32 vectors (same arithmetic as
    synthesize_clustered_embeddings / ora_ivf_clustered), trains the SAME
    per-subspace codebooks via the shared pq_train_codebooks, and encodes
    with the shared pq_encode_mat — codes and the rounded reconstruction
    error are identical by construction."""
    import numpy as np

    from .functions.similarity import pq_encode_mat, pq_train_codebooks

    mat32 = np.empty((n, dim), dtype=np.float32)
    for i in range(n):
        c = i % n_clusters
        center = np.random.default_rng(seed * 1_000_003 + c).standard_normal(dim)
        center /= np.linalg.norm(center)
        noise = np.random.default_rng(seed * 2_000_003 + i).standard_normal(dim)
        mat32[i] = (center + sigma * noise).astype(np.float32)
    mat = mat32.astype(np.float64)
    books = pq_train_codebooks(mat[:train_limit], m, k, n_iters)
    codes, err = pq_encode_mat(mat, books)
    rows = [
        (i, *(int(c) for c in codes[i]), float(err[i])) for i in range(n)
    ]
    cols = (
        [("vec_id", "BIGINT")]
        + [(f"code{s}", "INTEGER") for s in range(m)]
        + [("recon_err", "DOUBLE")]
    )
    return values_sql(rows, cols)


def ora_double_sweep(d: str) -> str:
    """Sequential double-sweep oracle for graph_double_sweep_diameter
    (operators/paths.py) over the small copurchase subgraph."""
    from .functions import kernels as K

    s1, s2, bound = K.double_sweep_diameter(_cp_small_adj(d))
    return values_sql(
        [(s1, s2, bound)],
        [("sweep1_source", "BIGINT"), ("sweep2_source", "BIGINT"),
         ("diameter_lower_bound", "INTEGER")],
    )


def ora_pq_adc(
    d: str,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 50,
    sigma: float = 0.05,
    seed: int = 7,
    n_queries: int = 16,
    k_neighbors: int = 10,
    m: int = 4,
    k: int = 16,
    n_iters: int = 10,
    train_limit: int = 4096,
) -> str:
    """numpy mirror of similarity.pq_adc_topk over the clustered fixture:
    shared codebooks + codes + integer micro-unit LUT, exact integer ADC
    sums, ranking (adc_micro ASC, neighbor ASC)."""
    import numpy as np

    from .functions.similarity import (
        pq_adc_lut,
        pq_encode_mat,
        pq_train_codebooks,
    )

    mat32 = np.empty((n, dim), dtype=np.float32)
    for i in range(n):
        c = i % n_clusters
        center = np.random.default_rng(seed * 1_000_003 + c).standard_normal(dim)
        center /= np.linalg.norm(center)
        noise = np.random.default_rng(seed * 2_000_003 + i).standard_normal(dim)
        mat32[i] = (center + sigma * noise).astype(np.float32)
    mat = mat32.astype(np.float64)
    books = pq_train_codebooks(mat[:train_limit], m, k, n_iters)
    codes, _ = pq_encode_mat(mat, books)
    lut = pq_adc_lut(mat[:n_queries], books)
    rows = []
    for qi in range(n_queries):
        costs = [
            (int(sum(int(lut[qi, s, codes[i, s]]) for s in range(m))), i)
            for i in range(n)
            if i != qi
        ]
        for r, (cost, i) in enumerate(sorted(costs)[:k_neighbors]):
            rows.append((qi, i, cost, r + 1))
    return values_sql(
        rows,
        [("query_id", "BIGINT"), ("neighbor_id", "BIGINT"),
         ("adc_micro", "BIGINT"), ("rank", "INTEGER")],
    )


def ora_louvain_moves(d: str, max_rounds: int = 6) -> str:
    """Sequential Louvain-phase-1 oracle for graph_louvain_moves
    (operators/louvain.py) over the full copurchase graph."""
    from .functions import kernels as K

    labels = K.louvain_moves(_cp_adj(d), max_rounds=max_rounds)
    return values_sql(
        sorted(labels.items()), [("v", "BIGINT"), ("community", "BIGINT")]
    )


def ora_louvain_modularity(d: str, max_rounds: int = 6) -> str:
    """Exact-integer modularity oracle for graph_louvain_modularity:
    kernel louvain labels -> kernel modularity, same integers, same
    single IEEE division."""
    from .functions import kernels as K

    adj = _cp_adj(d)
    labels = K.louvain_moves(adj, max_rounds=max_rounds)
    n, q_num, q_den, q = K.modularity_of(adj, labels)
    return values_sql(
        [(n, q_num, q_den, q)],
        [("n_communities", "BIGINT"), ("q_num", "BIGINT"),
         ("q_den", "BIGINT"), ("modularity", "DOUBLE")],
    )
