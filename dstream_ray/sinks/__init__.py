from dstream_ray.sinks.parquet_sink import ExactlyOnceParquetSink  # noqa: F401
