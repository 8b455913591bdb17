from dcafs_spark.sinks.file_collector import FileCollector
from dcafs_spark.sinks.db import SqliteSink, ddl_for, jdbc_batch_sink
from dcafs_spark.sinks.tcp_push import tcp_push_sink, telnet_push_sink

__all__ = [
    "FileCollector",
    "SqliteSink",
    "ddl_for",
    "jdbc_batch_sink",
    "tcp_push_sink",
    "telnet_push_sink",
]
