"""dachshund_spark — a from-scratch PySpark-native link-graph analytics
engine with the algorithm surface of facebookresearch/dachshund, re-expressed
as DataFrame/SQL supersteps plus Arrow-vectorized per-graph kernels.

Entry points:
    from dachshund_spark.session import get_spark
    from dachshund_spark.operators import pagerank, components, triangles, ...
    python -m dachshund_spark.jobs <job> --input ... --output ...

See COVERAGE.md for the operator inventory mapping and BENCH/ for measured
plans and throughput.
"""

__version__ = "0.1.0"
