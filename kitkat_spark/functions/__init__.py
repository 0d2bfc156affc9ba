from kitkat_spark.functions.kpl import (  # noqa: F401
    KPL_MAGIC,
    aggregate_records,
    deaggregate_blob,
    is_aggregated_col,
    kpl_deaggregate_udf,
)
from kitkat_spark.functions.compression import zlib_compress_udf, zlib_decompress_udf  # noqa: F401
