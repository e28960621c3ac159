from riko_spark.plans.codegen import compile_pipe, stringify_pipe  # noqa: F401
from riko_spark.plans.confs import cast_literal, normalize_conf  # noqa: F401
from riko_spark.plans.dag import build_pipeline, parse_pipe_def  # noqa: F401
from riko_spark.plans.flow import Flow  # noqa: F401
