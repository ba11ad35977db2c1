"""User-extension surface (≙ the reference's provider protocol + SDK
abstractions, /root/reference/readme.md:297-306 and
docs/capability-inventory.md:222-256, restated in-process).

A dstream provider was "any binary speaking JSON lines over stdio"; here the
equivalents are small Python protocols that plug into the engine:

- :class:`Source` — yields epoch batches (the input-provider analog of
  ``IInputProvider.ReadAsync``).
- :class:`WindowKernel` — any ``(new_rows, state, *, flush, **params) ->
  (emissions, state)`` callable; register it in
  ``pipelines.streaming.WINDOW_OPERATORS`` and name it in
  ``StreamingConfig.operators``.
- :class:`Sink` — ``init/write_staged/promote/destroy`` (the
  ``ChangeDataTransport`` analog: batch-only publishing, explicit
  destination lifecycle, internal/types/publisher/publisher.go:11-24).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class Source(Protocol):
    def epochs(self) -> Iterator[pa.Table]:
        """Yield one Arrow table per micro-batch epoch, per-conv ordered."""
        ...


@runtime_checkable
class WindowKernel(Protocol):
    def __call__(
        self, new_rows: pa.Table, state: dict, *, flush: bool, **params: Any
    ) -> tuple[pa.Table, dict]:
        ...


@runtime_checkable
class Sink(Protocol):
    def init(self) -> None: ...

    def destroy(self) -> None: ...

    def write_staged(
        self, table: pa.Table, op: str, partition: int, epoch: int, watermark_us: int
    ) -> str: ...
