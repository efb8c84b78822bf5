"""Config front-end: dict/JSON pipeline definitions -> PipelineSpec.

The reference's user surface is a declarative config file whose pipeline
blocks carry source/joins/filters/select/validations/destination
(crates/smql-syntax builder -> crates/model/src/execution/pipeline.rs:10-24).
This front-end accepts the same shape as plain data (dict / parsed JSON or
YAML), with all expressions in the text language of functions/parser.py:

    {
      "name": "orders_flat",
      "source": "orders",
      "destination": "dst",
      "filter": "o_totalprice > 100000 and o_orderstatus == 'F'",
      "joins": [{"alias": "c", "table": "customer",
                 "on": [["o_custkey", "c_custkey"]], "kind": "inner"}],
      "mappings": [["order_id", "o_orderkey"],
                   ["tier", "when { o_totalprice > 200000.0 then 'high' else 'low' }"]],
      "copy_columns": "MAP_ONLY",
      "validations": [{"name": "pos", "check": "o_totalprice > 0",
                       "action": "skip"}],
      "write_mode": "upsert",
      "key": "order_id",
      "after": []
    }
"""

from __future__ import annotations

from stratum_spark.functions.parser import parse_expr
from stratum_spark.plans.pipeline import JoinSpec, PipelineSpec, ValidationRule


def pipeline_from_dict(d: dict) -> PipelineSpec:
    joins = tuple(
        JoinSpec(
            alias=j["alias"],
            table=j["table"],
            on=tuple((l, r) for l, r in j["on"]),
            kind=j.get("kind", "inner"),
            broadcast=j.get("broadcast", True),
        )
        for j in d.get("joins", [])
    )
    mappings = tuple((tgt, parse_expr(src)) for tgt, src in d.get("mappings", []))
    validations = tuple(
        ValidationRule(v["name"], parse_expr(v["check"]), v.get("action", "skip"))
        for v in d.get("validations", [])
    )
    return PipelineSpec(
        name=d["name"],
        source=d["source"],
        destination=d["destination"],
        filter=parse_expr(d["filter"]) if d.get("filter") else None,
        joins=joins,
        mappings=mappings,
        copy_columns=d.get("copy_columns", "ALL"),
        validations=validations,
        write_mode=d.get("write_mode", "insert"),
        key=d.get("key"),
        after=tuple(d.get("after", [])),
    )


def pipelines_from_config(cfg: dict) -> list[PipelineSpec]:
    """Full config document: {"pipelines": [...]} (the smql program analog)."""
    return [pipeline_from_dict(p) for p in cfg["pipelines"]]
