"""FK join-graph: automatic join-path discovery over foreign-key metadata.

Mirrors the reference's join utilities (crates/connectors/src/sql/join/
utils.rs): `find_join_path` BFS-walks the FK graph treating BOTH
referenced and referencing edges as neighbors (so orders -> supplier
resolves through nation even though supplier only REFERENCES nation);
`combine_join_paths` merges several target paths into one duplicate-free
join order; `join_specs` wires the ON conditions from the FK column
pairs (composite keys supported) exactly like build_join_clauses
(utils.rs:76-160). The FK-reachable closure (`expand`) is the
graph-expansion discovery of crates/engine-schema/src/graph_expander.rs.

The produced JoinSpecs plug straight into PipelineSpec.joins, so a
pipeline can name only the TABLES it wants and let the graph derive the
path + conditions -- the reference's "migrate with related tables"
behavior."""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from stratum_spark.plans.pipeline import JoinSpec


@dataclass(frozen=True)
class ForeignKey:
    table: str
    columns: tuple[str, ...]
    referenced_table: str
    referenced_columns: tuple[str, ...]

    def __post_init__(self):
        if len(self.columns) != len(self.referenced_columns):
            raise ValueError(f"FK column arity mismatch: {self}")


class JoinGraph:
    def __init__(self, fks: list[ForeignKey]):
        self.fks = list(fks)
        self._neighbors: dict[str, set[str]] = {}
        for fk in self.fks:
            a, b = fk.table.lower(), fk.referenced_table.lower()
            self._neighbors.setdefault(a, set()).add(b)
            self._neighbors.setdefault(b, set()).add(a)

    # ------------------------------------------------------------------
    def find_join_path(self, start: str, target: str) -> list[str] | None:
        """Shortest FK path start -> target (BFS over both edge
        directions), or None (utils.rs:9-51)."""
        start, target = start.lower(), target.lower()
        if start not in self._neighbors or target not in self._neighbors:
            return None if start != target else [start]
        visited = {start}
        queue: deque[list[str]] = deque([[start]])
        while queue:
            path = queue.popleft()
            if path[-1] == target:
                return path
            for nbr in sorted(self._neighbors.get(path[-1], ())):
                if nbr not in visited:
                    visited.add(nbr)
                    queue.append(path + [nbr])
        return None

    def combine_join_paths(self, paths: list[list[str]], root: str) -> list[str]:
        """Merge several paths into one duplicate-free join order, root
        excluded (utils.rs:55-73)."""
        root = root.lower()
        seen, out = set(), []
        for path in paths:
            for t in path:
                if t == root:
                    continue
                if t not in seen:
                    seen.add(t)
                    out.append(t)
        return out

    def expand(self, root: str) -> list[str]:
        """Every table FK-reachable from root, BFS order (the reference's
        graph expansion: include_related discovery)."""
        root = root.lower()
        visited = {root}
        out: list[str] = []
        queue = deque([root])
        while queue:
            cur = queue.popleft()
            for nbr in sorted(self._neighbors.get(cur, ())):
                if nbr not in visited:
                    visited.add(nbr)
                    out.append(nbr)
                    queue.append(nbr)
        return out

    # ------------------------------------------------------------------
    def _fk_between(self, a: str, b: str) -> ForeignKey | None:
        """An FK declared on `a` that references `b`."""
        for fk in self.fks:
            if fk.table.lower() == a and fk.referenced_table.lower() == b:
                return fk
        return None

    def join_specs(
        self,
        root: str,
        targets: list[str],
        kind: str = "inner",
        broadcast: bool = True,
    ) -> tuple[JoinSpec, ...]:
        """Auto-build the JoinSpec chain that connects root to every
        target: find each path, merge them, then wire ON conditions from
        the FK column pairs step by step (utils.rs:76-160; composite FKs
        produce one equi-condition per column pair). Raises if any target
        is unreachable or any hop has no FK relation."""
        root_l = root.lower()
        paths = []
        for t in targets:
            p = self.find_join_path(root_l, t)
            if p is None:
                raise ValueError(f"no FK join path from {root!r} to {t!r}")
            paths.append(p)
        order = self.combine_join_paths(paths, root_l)
        # each hop joins `nxt` against the nearest already-joined table on
        # its path (the predecessor in BFS order)
        specs: list[JoinSpec] = []
        placed = {root_l}
        for nxt in order:
            # find the neighbor of nxt that is already placed
            pred = None
            for cand in sorted(self._neighbors.get(nxt, ())):
                if cand in placed:
                    pred = cand
                    break
            if pred is None:  # pragma: no cover - combine order guarantees one
                raise ValueError(f"join order broke: {nxt} has no placed neighbor")
            on: list[tuple[str, str]] = []
            fk = self._fk_between(nxt, pred)
            if fk is not None:
                # nxt.col references pred.ref_col
                on = [
                    (f"{pred}.{rc}", f"{nxt}.{c}")
                    for c, rc in zip(fk.columns, fk.referenced_columns)
                ]
            else:
                fk = self._fk_between(pred, nxt)
                if fk is None:
                    raise ValueError(f"no FK relation between {pred} and {nxt}")
                # pred.col references nxt.ref_col
                on = [
                    (f"{pred}.{c}", f"{nxt}.{rc}")
                    for c, rc in zip(fk.columns, fk.referenced_columns)
                ]
            specs.append(
                JoinSpec(alias=nxt, table=nxt, on=tuple(on), kind=kind, broadcast=broadcast)
            )
            placed.add(nxt)
        return tuple(specs)
