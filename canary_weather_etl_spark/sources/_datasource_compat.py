"""Shared pyspark-4 DataSource import scaffolding: one place defines the
HAS_DATASOURCE_API flag and the pre-4 stub classes, so the reader
(weather_datasource) and the sink (manifest_sink) cannot drift."""

from __future__ import annotations

from dataclasses import dataclass

try:
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        DataSourceStreamWriter,
                                        DataSourceWriter, InputPartition,
                                        WriterCommitMessage)
    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class DataSourceStreamWriter:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

    @dataclass
    class WriterCommitMessage:  # type: ignore[no-redef]
        pass


__all__ = ["HAS_DATASOURCE_API", "DataSource", "DataSourceReader",
           "DataSourceStreamWriter", "DataSourceWriter", "InputPartition",
           "WriterCommitMessage"]
