from .reshape import reshape_cql, reshape_thrift, melt_to_mutations
from .legacy import parse_legacy_lines, format_legacy_lines
from .partitioning import with_token, with_bucket, route_to_buckets

__all__ = [
    "reshape_cql",
    "reshape_thrift",
    "melt_to_mutations",
    "parse_legacy_lines",
    "format_legacy_lines",
    "with_token",
    "with_bucket",
    "route_to_buckets",
]
