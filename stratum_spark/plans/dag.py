"""Pipeline DAG execution: topo levels, parallel within a level, failure
isolation between independent pipelines.

Mirrors crates/engine-runtime/src/dag/{builder.rs,executor.rs}: `after=[...]`
dependencies build topological levels; levels run sequentially; pipelines
within a level run concurrently (the reference uses futures::stream, we use
threads -- the Spark scheduler is thread-safe and runs independent jobs in
parallel). A failed pipeline poisons its transitive dependents but not
independent branches (crates/engine-tests/src/dag_integration.rs failure-
isolation scenarios).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from stratum_spark.plans.pipeline import Catalog, PipelineResult, PipelineSpec, run_pipeline


def topo_levels(specs: list[PipelineSpec]) -> list[list[PipelineSpec]]:
    """Kahn's algorithm into levels; deterministic order within a level
    (name-sorted -- the reference's deterministic partial topo order,
    crates/engine-schema/src/dep_graph.rs:67-112)."""
    by_name = {s.name: s for s in specs}
    indeg = {s.name: 0 for s in specs}
    dependents: dict[str, list[str]] = {s.name: [] for s in specs}
    for s in specs:
        for dep in s.after:
            if dep not in by_name:
                raise ValueError(f"{s.name}: unknown dependency {dep}")
            indeg[s.name] += 1
            dependents[dep].append(s.name)
    level = sorted(n for n, d in indeg.items() if d == 0)
    levels: list[list[PipelineSpec]] = []
    seen = 0
    while level:
        levels.append([by_name[n] for n in level])
        seen += len(level)
        nxt: set[str] = set()
        for n in level:
            for m in dependents[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    nxt.add(m)
        level = sorted(nxt)
    if seen != len(specs):
        cyc = sorted(n for n, d in indeg.items() if d > 0)
        raise ValueError(f"dependency cycle among: {cyc}")
    return levels


def run_dag(
    specs: list[PipelineSpec],
    catalog: Catalog,
    warehouse: dict,
    max_parallel: int = 4,
    hooks: dict[str, dict] | None = None,
) -> dict[str, PipelineResult]:
    """hooks: pipeline name -> {'before': [sql...], 'after': [sql...]}.
    Lifecycle hook SQL runs against the Spark session catalog immediately
    before/after its pipeline's data phase (the reference executes hooks
    around migration, crates/engine-runtime/src/execution/orchestrator.rs:
    76-93; scenarios in crates/engine-tests/src/integration.rs). A failing
    before-hook fails the pipeline (data phase never runs); after-hooks run
    only on success and see the destination's post-write state (its temp
    view is re-registered first)."""
    results: dict[str, PipelineResult] = {}
    failed: set[str] = set()
    hooks = hooks or {}

    def _run_hooks(spec: PipelineSpec, phase: str, res: PipelineResult) -> None:
        stmts = hooks.get(spec.name, {}).get(phase, [])
        if not stmts:
            return
        if phase == "after" and spec.destination in warehouse:
            warehouse[spec.destination].read().createOrReplaceTempView(spec.destination)
        for sql in stmts:
            catalog.spark.sql(sql)
            res.hooks_run.append(f"{phase}: {sql}")

    def _run(spec: PipelineSpec) -> PipelineResult:
        if any(d in failed for d in spec.after):
            r = PipelineResult(spec.name, skipped=True, error="dependency failed")
            return r
        res = PipelineResult(spec.name)
        try:
            _run_hooks(spec, "before", res)
            # once the data phase returns, `res` tracks the COMPLETED result:
            # an after-hook failure must surface on the result that carries
            # the write stats (the write already committed durably), not on
            # the empty pre-pipeline placeholder
            r = run_pipeline(spec, catalog, warehouse)
            r.hooks_run = res.hooks_run + r.hooks_run
            res = r
            _run_hooks(spec, "after", res)
            return res
        except Exception as e:  # failure isolation
            res.error = str(e)
            return res

    for level in topo_levels(specs):
        with ThreadPoolExecutor(max_workers=max_parallel) as ex:
            for r in ex.map(_run, level):
                results[r.name] = r
                if r.error is not None:
                    failed.add(r.name)
    return results
