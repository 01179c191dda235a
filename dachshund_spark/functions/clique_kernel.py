"""Typed-bipartite quasi-clique mining via beam search — the pure-Python
kernel behind the ``clique_miner`` per-graph operator.

A from-scratch re-implementation of the reference's flagship query
(clique_miner CLI): typed graph build with dense renumbering + min-degree
prune (typed_graph_builder.rs:29-228), incremental candidate bookkeeping
(candidate.rs:101-743), diversity+density scoring (scorer.rs:42-157), and
the beam search with lazy recipe expansion, visited-set checksums,
deterministic tie-breaks and early stopping (beam.rs:54-316).

Deliberate divergences (documented):
* checksums use md5-derived 64-bit node hashes combined by wrapping add
  (same order-independence property as candidate.rs:793-802, different
  hash function — Rust's DefaultHasher is not a stable public algorithm);
* the seeding RNG is Python's Mersenne Twister seeded from
  md5(graph_key), matching the reference's *discipline* (deterministic
  per graph id, beam.rs:102-106) but not its exact stream (Rust StdRng);
* scores are f64 (reference uses f32) — tie-break order can differ in
  ulp-level cases; outputs are compared structurally.
"""

from __future__ import annotations

import hashlib
import math
import random
from dataclasses import dataclass, field

MASK64 = (1 << 64) - 1


def node_hash(node_id: int) -> int:
    return int.from_bytes(
        hashlib.md5(node_id.to_bytes(8, "little")).digest()[:8], "little"
    )


def merge_checksum(checksum: int | None, node_id: int) -> int:
    h = node_hash(node_id)
    return h if checksum is None else (checksum + h) & MASK64


@dataclass
class SearchProblem:
    """cf. search_problem.rs:7-39."""

    beam_size: int = 20
    alpha: float = 1.0
    global_thresh: float | None = 1.0
    local_thresh: float | None = 1.0
    num_to_search: int = 20
    num_epochs: int = 100
    max_repeated_prior_scores: int = 3
    min_degree: int = 1


class TypedNode:
    __slots__ = ("node_id", "is_core", "non_core_type", "edges", "neighbors_sets", "max_edge_count")

    def __init__(self, node_id, is_core, non_core_type, max_edge_count):
        self.node_id = node_id
        self.is_core = is_core
        self.non_core_type = non_core_type  # int type id (1-based) or None
        self.edges = []  # list[(edge_type_id, target_id)]
        self.neighbors_sets = {}  # edge_type_id -> set(target_id)
        self.max_edge_count = max_edge_count  # per non-core node

    def degree(self):
        return len(self.edges)

    def count_ties_with_ids(self, ids):
        return sum(len(s & ids) for s in self.neighbors_sets.values())

    def count_ties_with_id(self, nid):
        return sum(1 for s in self.neighbors_sets.values() if nid in s)


class TypedGraph:
    """Dense-renumbered bipartite typed graph
    (cf. typed_graph.rs:29-66, typed_graph_builder.rs:126-169)."""

    def __init__(self):
        self.nodes = {}
        self.core_ids = []
        self.non_core_ids = []
        self.labels_map = {}

    @property
    def reverse_labels_map(self):
        return {v: k for k, v in self.labels_map.items()}


def process_typespec(typespec: list[list[str]]):
    """typespec -> (core_type, sorted non_core_types, sorted edge_types,
    {non_core_type_name: (type_id 1-based, max_edge_count)}).
    cf. transformer.rs:88-108,160-169."""
    core_type = typespec[0][0]
    non_core_types = sorted(x[2] for x in typespec)
    edge_types = sorted(x[1] for x in typespec)
    type_ids: dict[str, list] = {}
    for i, t in enumerate(non_core_types):
        type_ids.setdefault(t, [i + 1, 0])
    for row in typespec:
        assert row[0] == core_type
        type_ids[row[2]][1] += 1
    return core_type, non_core_types, edge_types, {
        k: tuple(v) for k, v in type_ids.items()
    }


def build_typed_graph(edge_rows, typespec, min_degree=None) -> TypedGraph:
    """edge_rows: (core_label, non_core_label, edge_type_name,
    non_core_type_name).  cf. typed_graph_builder.rs:29-54."""
    core_type, non_core_types, edge_types, type_ids = process_typespec(typespec)
    etype_idx = {t: i for i, t in enumerate(edge_types)}

    source_labels = sorted({r[0] for r in edge_rows})
    target_labels = sorted({r[1] for r in edge_rows})
    target_types = {r[1]: r[3] for r in edge_rows}

    g = TypedGraph()
    i = 0
    for lbl in source_labels:
        g.nodes[i] = TypedNode(i, True, None, None)
        g.core_ids.append(i)
        g.labels_map[("c", lbl)] = i
        i += 1
    for lbl in target_labels:
        tid, mec = type_ids[target_types[lbl]]
        g.nodes[i] = TypedNode(i, False, tid, mec)
        g.non_core_ids.append(i)
        g.labels_map[("n", lbl)] = i
        i += 1

    for core_lbl, non_core_lbl, etype, _nctype in edge_rows:
        s = g.labels_map[("c", core_lbl)]
        t = g.labels_map[("n", non_core_lbl)]
        et = etype_idx[etype]
        sn = g.nodes[s]
        sn.neighbors_sets.setdefault(et, set()).add(t)
        sn.edges.append((et, t))
        tn = g.nodes[t]
        tn.neighbors_sets.setdefault(et, set()).add(s)
        tn.edges.append((et, s))

    if min_degree is not None and min_degree > 1:
        g = prune(g, edge_rows, typespec, min_degree)
    return g


def trim_vertices(g: TypedGraph, min_degree: int) -> set:
    """cf. typed_graph_builder.rs:174-202 (trim_edges)."""
    degree = {nid: n.degree() for nid, n in g.nodes.items()}
    to_delete = set()
    while True:
        to_update = {
            nid
            for nid, d in degree.items()
            if d < min_degree and nid not in to_delete
        }
        if not to_update:
            break
        to_delete |= to_update
        for nid in to_update:
            for _, tgt in g.nodes[nid].edges:
                degree[tgt] -= 1
    return to_delete


def prune(g: TypedGraph, edge_rows, typespec, min_degree: int) -> TypedGraph:
    """cf. typed_graph_builder.rs:208-228 — rebuild from surviving rows."""
    while True:
        bad = trim_vertices(g, min_degree)
        if not bad:
            return g
        rev = g.reverse_labels_map
        bad_labels = {rev[nid] for nid in bad}
        edge_rows = [
            r
            for r in edge_rows
            if ("c", r[0]) not in bad_labels and ("n", r[1]) not in bad_labels
        ]
        if not edge_rows:
            gg = TypedGraph()
            return gg
        g = build_typed_graph(edge_rows, typespec, min_degree=None)


class Scorer:
    """cf. scorer.rs:42-157; golden math tests/scoring.rs:24-91."""

    def __init__(self, num_non_core_types: int, sp: SearchProblem):
        self.num_non_core_types = num_non_core_types
        self.alpha = sp.alpha
        self.global_thresh = sp.global_thresh
        self.local_thresh = sp.local_thresh

    @staticmethod
    def diversity_score(node_counts):
        return sum(math.log(c + 1.0) for c in node_counts)

    def get_global_thresh_score(self, cliqueness):
        if self.global_thresh is None:
            return 1.0
        return 1.0 if cliqueness >= self.global_thresh else 0.0

    def score(self, candidate: "Candidate") -> float:
        if not candidate.core_ids or not candidate.non_core_ids:
            return -1.0
        score = self.diversity_score(candidate.node_counts)
        cliqueness = candidate.get_cliqueness()
        score += cliqueness * self.alpha
        score *= self.get_global_thresh_score(cliqueness)
        if self.local_thresh is not None:
            score *= 1.0 if candidate.local_thresh_score_at_least(self.local_thresh) else 0.0
        return score

    def score_recipe(self, recipe: "Recipe", candidate: "Candidate") -> float:
        assert recipe.checksum == candidate.checksum
        if recipe.score is not None:
            return recipe.score
        node = candidate.graph.nodes[recipe.node_id]
        node_type_id = 0 if node.is_core else node.non_core_type
        if candidate.get_size_with_node(node) == 0:
            return -1.0
        node_counts = list(candidate.node_counts)
        node_counts[node_type_id] += 1
        score = self.diversity_score(node_counts)
        cliqueness = candidate.get_cliqueness_with_node(node)
        score += cliqueness * self.alpha
        score *= self.get_global_thresh_score(cliqueness)
        if self.local_thresh is not None:
            ok, guarantee = candidate.local_thresh_score_with_node_at_least(
                self.local_thresh, node
            )
            if ok:
                recipe.local_guarantee = guarantee
            else:
                score = 0.0
        return score


@dataclass
class LocalDensityGuarantee:
    num_edges: int = 0
    exceptions: set = field(default_factory=set)


@dataclass
class Recipe:
    """cf. candidate.rs:48-70."""

    checksum: int | None
    node_id: int | None
    score: float | None = None
    local_guarantee: LocalDensityGuarantee | None = None

    def key(self):
        if self.node_id is not None:
            return merge_checksum(self.checksum, self.node_id)
        return self.checksum


class Candidate:
    """Incremental quasi-biclique state (cf. candidate.rs:101-743)."""

    def __init__(self, graph: TypedGraph, num_non_core_types: int):
        self.graph = graph
        self.core_ids = set()
        self.non_core_ids = set()
        self.checksum = None
        self.score = None
        self.max_core_node_edges = 0
        self.ties_between_nodes = 0
        self.local_guarantee = LocalDensityGuarantee()
        self.neighborhood = {}
        self.node_counts = [0] * (num_non_core_types + 1)

    @classmethod
    def from_node(cls, node_id, graph, scorer: Scorer):
        c = cls(graph, scorer.num_non_core_types)
        c.add_node(node_id)
        c.score = scorer.score(c)
        return c

    @classmethod
    def from_seed_labels(cls, labels, graph, scorer: Scorer):
        """cf. candidate.rs:167-189 (from_clique_rows); labels are
        ('c'|'n', label) keys."""
        c = cls(graph, scorer.num_non_core_types)
        for key in labels:
            if key in graph.labels_map:
                c.add_node(graph.labels_map[key])
        if c.checksum is None:
            return None
        c.score = scorer.score(c)
        return c

    def add_node(self, node_id):
        self.checksum = merge_checksum(self.checksum, node_id)
        node = self.graph.nodes[node_id]
        if node.is_core:
            self.core_ids.add(node_id)
            self.local_guarantee.exceptions.add(node_id)
            self.node_counts[0] += 1
        else:
            self.non_core_ids.add(node_id)
            self.max_core_node_edges += node.max_edge_count
            self.node_counts[node.non_core_type] += 1
        # increment ties (before/after insertion is equivalent; set add of
        # self id doesn't affect opposite-shore intersection)
        self.ties_between_nodes += (
            node.count_ties_with_ids(self.non_core_ids)
            if node.is_core
            else node.count_ties_with_ids(self.core_ids)
        )
        self.score = None
        # neighborhood maintenance (candidate.rs:722-743)
        opposite = self.non_core_ids if node.is_core else self.core_ids
        for _, tgt in node.edges:
            if tgt not in opposite:
                self.neighborhood[tgt] = self.neighborhood.get(tgt, 0) + 1
        self.neighborhood.pop(node_id, None)

    def replicate(self, keep_score: bool):
        c = Candidate(self.graph, len(self.node_counts) - 1)
        c.core_ids = set(self.core_ids)
        c.non_core_ids = set(self.non_core_ids)
        c.checksum = self.checksum
        c.score = self.score if keep_score else None
        c.max_core_node_edges = self.max_core_node_edges
        c.ties_between_nodes = self.ties_between_nodes
        c.local_guarantee = LocalDensityGuarantee(
            self.local_guarantee.num_edges, set(self.local_guarantee.exceptions)
        )
        c.neighborhood = dict(self.neighborhood)
        c.node_counts = list(self.node_counts)
        return c

    def expand_from_recipe(self, recipe: Recipe):
        c = self.replicate(False)
        if recipe.node_id is not None:
            c.add_node(recipe.node_id)
            c.score = recipe.score
            if recipe.local_guarantee is not None:
                c.local_guarantee = LocalDensityGuarantee(
                    recipe.local_guarantee.num_edges,
                    set(recipe.local_guarantee.exceptions),
                )
        else:
            c.score = self.score
        return c

    def as_recipe(self):
        return Recipe(
            checksum=self.checksum,
            node_id=None,
            score=self.score,
            local_guarantee=LocalDensityGuarantee(
                self.local_guarantee.num_edges, set(self.local_guarantee.exceptions)
            ),
        )

    def get_size(self):
        return len(self.core_ids) * self.max_core_node_edges

    def get_size_with_node(self, node):
        if node.is_core:
            return (len(self.core_ids) + 1) * self.max_core_node_edges
        return len(self.core_ids) * (self.max_core_node_edges + node.max_edge_count)

    def get_cliqueness(self):
        size = self.get_size()
        return self.ties_between_nodes / size if size > 0 else 1.0

    def get_cliqueness_with_node(self, node):
        size = self.get_size_with_node(node)
        new_ties = node.count_ties_with_ids(
            self.non_core_ids if node.is_core else self.core_ids
        )
        ties = self.ties_between_nodes + new_ties
        return ties / size if size > 0 else 1.0

    def is_clique(self):
        return self.ties_between_nodes == self.get_size()

    def local_thresh_score_at_least(self, thresh):
        """cf. candidate.rs:650-693 (mutates the guarantee on success)."""
        if thresh == 0.0:
            return True
        implied = math.ceil(thresh * self.max_core_node_edges)
        check_all = self.local_guarantee.num_edges < implied
        to_check = self.core_ids if check_all else self.local_guarantee.exceptions
        min_edges = None
        for nid in to_check:
            ec = self.graph.nodes[nid].count_ties_with_ids(self.non_core_ids)
            if ec < implied:
                return False
            min_edges = ec if min_edges is None else min(min_edges, ec)
        new_num = min_edges if min_edges is not None else self.local_guarantee.num_edges
        if not check_all:
            new_num = min(self.local_guarantee.num_edges, new_num)
        self.local_guarantee = LocalDensityGuarantee(new_num, set())
        return True

    def local_thresh_score_with_node_at_least(self, thresh, node):
        """cf. candidate.rs:575-645."""
        if thresh == 0.0:
            return True, None
        new_max = self.max_core_node_edges + (
            0 if node.is_core else node.max_edge_count
        )
        implied = math.ceil(thresh * new_max)
        check_all = self.local_guarantee.num_edges < implied
        to_check = self.core_ids if check_all else self.local_guarantee.exceptions
        min_edges = None
        for nid in to_check:
            ec = self.graph.nodes[nid].count_ties_with_ids(self.non_core_ids)
            if not node.is_core:
                ec += node.count_ties_with_id(nid)
            if ec < implied:
                return False, None
            min_edges = ec if min_edges is None else min(min_edges, ec)
        if node.is_core:
            ec = node.count_ties_with_ids(self.non_core_ids)
            if ec < implied:
                return False, None
            min_edges = ec if min_edges is None else min(min_edges, ec)
        new_num = min_edges if min_edges is not None else self.local_guarantee.num_edges
        if not check_all:
            new_num = min(self.local_guarantee.num_edges, new_num)
        return True, LocalDensityGuarantee(new_num, set())

    def get_expansion_candidates(self, num_to_search, visited):
        """Bounded top-k by (ties desc, node_id desc... the reference heap
        orders (Reverse(ties), node_id): fewest-ties max-heap; final
        into_sorted_vec ascending = most ties first, then *smallest* id
        among ties (Reverse on ties only)."""
        assert self.checksum not in visited
        items = sorted(
            self.neighborhood.items(), key=lambda kv: (-kv[1], kv[0])
        )[:num_to_search]
        out = []
        for node_id, _ties in items:
            new_checksum = merge_checksum(self.checksum, node_id)
            if new_checksum not in visited:
                out.append(Recipe(checksum=self.checksum, node_id=node_id))
        visited.add(self.checksum)
        return out

    def one_step_search(self, num_to_search, visited, scorer):
        recipes = self.get_expansion_candidates(num_to_search, visited)
        for r in recipes:
            r.score = scorer.score_recipe(r, self)
        return recipes

    def get_core_densities(self):
        max_size = sum(
            self.graph.nodes[i].max_edge_count for i in self.non_core_ids
        )
        return [
            self.graph.nodes[nid].count_ties_with_ids(self.non_core_ids) / max_size
            for nid in sorted(self.core_ids)
        ]

    def get_non_core_densities(self, num_non_core_types):
        max_counts = [0] * (num_non_core_types + 1)
        out_counts = [0] * (num_non_core_types + 1)
        for nid in self.non_core_ids:
            n = self.graph.nodes[nid]
            max_counts[n.non_core_type] += n.max_edge_count * len(self.core_ids)
            out_counts[n.non_core_type] += n.count_ties_with_ids(self.core_ids)
        return [
            out_counts[i] / max_counts[i] if max_counts[i] else float("nan")
            for i in range(1, num_non_core_types + 1)
        ]


class Beam:
    """cf. beam.rs:38-316."""

    def __init__(self, graph: TypedGraph, sp: SearchProblem, graph_key,
                 seed_labels=None, num_non_core_types: int = 1):
        self.graph = graph
        self.sp = sp
        self.scorer = Scorer(num_non_core_types, sp)
        self.visited = set()
        seed = int.from_bytes(
            hashlib.md5(str(graph_key).encode()).digest()[:8], "little"
        )
        rng = random.Random(seed)
        self.candidates = []
        if seed_labels:
            init = Candidate.from_seed_labels(seed_labels, graph, self.scorer)
            if init is not None:
                self.candidates.append(init)
        core_ids, non_core_ids = graph.core_ids, graph.non_core_ids
        while len(self.candidates) < sp.beam_size:
            assert core_ids and non_core_ids
            ids = non_core_ids if rng.random() <= 0.5 else core_ids
            root = ids[rng.randrange(len(ids))]
            node = self._random_walk(rng, root, 7)
            self.candidates.append(Candidate.from_node(node, graph, self.scorer))

    def _random_walk(self, rng, node, length):
        cur = node
        for _ in range(length):
            edges = self.graph.nodes[cur].edges
            cur = edges[rng.randrange(len(edges))][1]
        return cur

    def one_step_search(self):
        """cf. beam.rs:145-245."""
        recipes = {}
        previous = {}
        can_continue = False
        for cand in self.candidates:
            if cand.checksum not in self.visited:
                can_continue = True
                for r in cand.one_step_search(
                    self.sp.num_to_search, self.visited, self.scorer
                ):
                    recipes[(r.checksum, r.node_id)] = r
            previous[cand.checksum] = cand
            r = cand.as_recipe()
            recipes[(r.checksum, r.node_id)] = r
        # sort by (score, checksum, node_id) desc (beam.rs:210-224)
        order = sorted(
            recipes.values(),
            key=lambda r: (
                r.score,
                r.checksum if r.checksum is not None else -1,
                r.node_id if r.node_id is not None else -1,
            ),
            reverse=True,
        )
        new_candidates = []
        for r in order[: self.sp.beam_size]:
            new_candidates.append(previous[r.checksum].expand_from_recipe(r))
        self.candidates = new_candidates
        return self.candidates[0].replicate(True), can_continue

    def run_search(self):
        """cf. beam.rs:253-316; returns (top_candidate, num_steps)."""
        prior = -2.0
        repeats = 0
        steps = 0
        if self.sp.num_epochs > 0:
            for i in range(self.sp.num_epochs - 1):
                steps = i + 1
                top, can_continue = self.one_step_search()
                if not can_continue:
                    break
                score = top.score
                assert score >= prior - 1e-9
                if abs(score - prior) <= 1e-12:
                    repeats += 1
                else:
                    repeats = 0
                if repeats == self.sp.max_repeated_prior_scores:
                    break
                prior = score
            top, _ = self.one_step_search()
            return top, steps
        best = max(self.candidates, key=lambda c: c.score or 0.0)
        return best.replicate(True), 0
