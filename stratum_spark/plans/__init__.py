from stratum_spark.plans.pipeline import (
    Catalog,
    JoinSpec,
    PipelineResult,
    PipelineSpec,
    ValidationRule,
    compile_pipeline,
    run_pipeline,
)
from stratum_spark.plans.dag import run_dag
from stratum_spark.plans.joingraph import ForeignKey, JoinGraph

__all__ = [
    "ForeignKey",
    "JoinGraph",
    "Catalog",
    "JoinSpec",
    "PipelineSpec",
    "PipelineResult",
    "ValidationRule",
    "compile_pipeline",
    "run_pipeline",
    "run_dag",
]
