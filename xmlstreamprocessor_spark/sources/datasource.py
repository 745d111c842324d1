"""Registered Spark Python DataSource for XML extraction.

This is the idiomatic Spark-4 packaging of the extraction kernel (SURVEY.md
§7 M2): after ``register_xml_source(spark)``,

    spark.read.format("xspxml")
         .schema("id int, name string")
         .option("rowTag", "rec")
         .option("path", "/data/xml")
         .load()

scans XML files distributed — one input partition per file (the same
parallel unit as ``read_xml``), bounded memory per task via iterparse, and
the records shaped by the user schema (element text and attributes matched
by field name, attributes winning only when no element matches; wildcard /
Tag() specs need the richer ``read_xml(spec=...)`` path).

A spec-aware variant rides the same source: ``option("specPickle", ...)``
(produced by ``spec_option``) carries a pickled compiled spec so the full
DSL semantics — wildcards, tag capture, coalesce, expressions — run inside
the registered source too.
"""

from __future__ import annotations

import base64
import pickle
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from xmlstreamprocessor_spark.plans.spec import CompiledSpec, Struct, compile_spec


def spec_option(spec: Struct | CompiledSpec) -> str:
    """Serialize a spec for ``option("specPickle", ...)``."""
    if isinstance(spec, Struct):
        spec = compile_spec(spec)
    return base64.b64encode(pickle.dumps(spec)).decode("ascii")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XmlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xspxml"

    def schema(self) -> StructType | str:
        # schema is required from the user (matches the reference: schemas
        # are declared, never guessed — Parser.cs builds them from the
        # lambda); inference lives in plans.infer, not here
        raise NotImplementedError(
            "xspxml requires an explicit .schema(...) or a specPickle option"
        )

    def reader(self, schema: StructType) -> "XmlSourceReader":
        return XmlSourceReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "XmlSimpleStreamReader":
        return XmlSimpleStreamReader(schema, self.options)


class XmlSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.row_tag = options.get("rowTag", "row")
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xspxml needs .option('path', ...) or load(path)")
        spec_b64 = options.get("specPickle")
        self.spec_bytes = base64.b64decode(spec_b64) if spec_b64 else None

    def partitions(self):  # one task per file — the read_xml parallel unit
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(
                p
                for p in glob.glob(os.path.join(self.path, "**"), recursive=True)
                if os.path.isfile(p)
            )
        else:
            files = sorted(glob.glob(self.path)) or [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        from xmlstreamprocessor_spark.sources.xml_batch import iterparse_records

        if self.spec_bytes is not None:
            compiled = pickle.loads(self.spec_bytes)
            coerce = {}
        else:
            compiled = _schema_spec(self.schema)
            # attribute fallbacks surface as raw strings (reference rule:
            # attributes are untyped, Parser.cs:417); coerce them to the
            # declared field type
            coerce = {f.name: _coercer(f.dataType) for f in self.schema.fields}
        names = [f.name for f in compiled.schema.fields]
        out_names = [f.name for f in self.schema.fields]
        assert names == out_names, (names, out_names)
        with open(partition.path, "rb") as fh:
            for rec in iterparse_records(fh, self.row_tag, compiled):
                yield tuple(
                    coerce[n](rec.get(n)) if n in coerce else rec.get(n)
                    for n in names
                )


def _coercer(dt):
    from pyspark.sql import types as T

    from xmlstreamprocessor_spark.plans.spec import (
        _conv_nbool,
        _conv_ndate,
        _conv_ndecimal,
        _conv_nint,
    )

    if isinstance(dt, (T.LongType, T.IntegerType)):
        conv = _conv_nint
    elif isinstance(dt, T.DecimalType):
        conv = _conv_ndecimal
    elif isinstance(dt, T.BooleanType):
        conv = _conv_nbool
    elif isinstance(dt, T.TimestampType):
        conv = _conv_ndate
    else:
        return lambda v: v

    def f(v):
        return conv(v) if isinstance(v, str) else v

    return f


def _schema_spec(schema: StructType) -> CompiledSpec:
    """Build an extraction spec from a plain Spark schema: each field reads
    the child element of that name, falling back to the attribute of the
    same name (element wins, via X.coalesce)."""
    from pyspark.sql import types as T

    from xmlstreamprocessor_spark.plans.spec import X

    def _long_conv(e):
        return int(e.text) if e.text and e.text.strip() else None

    fields = {}
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.DecimalType):
            base = X.ndecimal(f.name)
        elif isinstance(dt, T.LongType):
            base = X.custom(f.name, _long_conv, T.LongType())
        elif isinstance(dt, T.IntegerType):
            base = X.nint(f.name)
        elif isinstance(dt, T.BooleanType):
            base = X.nbool(f.name)
        elif isinstance(dt, T.TimestampType):
            base = X.ndate(f.name)
        elif isinstance(dt, T.StringType):
            base = X.string(f.name)
        else:
            raise ValueError(
                f"xspxml schema path cannot express field {f.name}: {dt}; "
                "pass a specPickle option instead"
            )
        fields[f.name] = X.coalesce(base, X.attr(f.name))
    return compile_spec(Struct("*", fields))


def register_xml_source(spark) -> None:
    """Register the ``xspxml`` format on this session."""
    spark.dataSource.register(XmlDataSource)


class XmlSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the ``xspxml`` source: the offset is the set of
    files already ingested (path -> size), so each micro-batch reads exactly
    the files that appeared since the last one — the same exactly-once
    file-discovery contract as Spark's built-in file stream source, with the
    extraction kernel applied in place."""

    def __init__(self, schema: StructType, options: dict):
        self._reader = XmlSourceReader(schema, options)

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _list(self) -> dict:
        import os

        out = {}
        for p in self._reader.partitions():
            try:
                out[p.path] = os.path.getsize(p.path)
            except OSError:
                continue
        return out

    def read(self, start: dict):
        seen = start.get("files", {})
        now = self._list()
        new_files = [p for p in sorted(now) if p not in seen]
        # materialized list, not a generator: the engine deep-copies the
        # (rows, offset) pair when prefetching
        rows = [
            r for path in new_files for r in self._reader.read(_FilePartition(path))
        ]
        return rows, {"files": now}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = start.get("files", {})
        target = end.get("files", {})
        for path in sorted(target):
            if path not in seen:
                yield from self._reader.read(_FilePartition(path))

    def commit(self, end: dict) -> None:
        pass
