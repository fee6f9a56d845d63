"""Streaming ingestion: incremental readers over growing sources.

TPU-native analogue of custreamz / libcudf_kafka
(reference: python/custreamz/custreamz/kafka.py Consumer.read_gdf,
cpp/libcudf_kafka/ wrapping librdkafka as a cudf datasource).  The broker
client itself is out of scope (librdkafka isn't in the image); this module
provides the same *shape* — an offset-tracked consumer that turns a range
of a growing log into a DataFrame — over file-backed sources, plus the
seam (`LogSource`) where a Kafka client would plug in.
"""

from __future__ import annotations

import io
import os
from typing import Optional

__all__ = ["LogSource", "FileLogSource", "StreamConsumer"]


class LogSource:
    """Abstract append-only byte log addressed by offsets."""

    def end_offset(self) -> int:
        raise NotImplementedError

    def read_range(self, start: int, end: int) -> bytes:
        raise NotImplementedError


class FileLogSource(LogSource):
    """A file being appended to (tail -f semantics)."""

    def __init__(self, path: str):
        self.path = path

    def end_offset(self) -> int:
        try:
            return os.path.getsize(self.path)
        except OSError:
            return 0

    def read_range(self, start: int, end: int) -> bytes:
        with open(self.path, "rb") as f:
            f.seek(start)
            return f.read(max(0, end - start))


class StreamConsumer:
    """Offset-tracked consumer: each poll parses newly appended complete
    records into a DataFrame (custreamz Consumer.read_gdf semantics:
    kafka.py read_gdf — batch of messages → cudf via json/csv reader).

    Partial trailing lines are held back until their terminator arrives,
    so every record is parsed exactly once.
    """

    def __init__(self, source: LogSource, fmt: str = "jsonl",
                 delimiter: bytes = b"\n", **reader_kwargs):
        self.source = source
        self.fmt = fmt
        self.delimiter = delimiter
        self.reader_kwargs = reader_kwargs
        self.committed = 0

    def poll(self, max_bytes: Optional[int] = None):
        """DataFrame of complete records appended since the last poll,
        or None if nothing new."""
        end = self.source.end_offset()
        if max_bytes is not None:
            end = min(end, self.committed + max_bytes)
        if end <= self.committed:
            return None
        raw = self.source.read_range(self.committed, end)
        cut = raw.rfind(self.delimiter)
        if cut < 0:
            return None  # no complete record yet
        chunk = raw[:cut + len(self.delimiter)]
        self.committed += cut + len(self.delimiter)
        return self._parse(chunk)

    def _parse(self, chunk: bytes):
        import cudf_tpu as ct

        buf = io.BytesIO(chunk)
        if self.fmt in ("jsonl", "json"):
            return ct.read_json(buf, lines=True, **self.reader_kwargs)
        if self.fmt == "csv":
            return ct.read_csv(buf, header=None, **self.reader_kwargs)
        raise ValueError(f"unknown stream format {self.fmt!r}")

    def seek(self, offset: int) -> None:
        self.committed = int(offset)
