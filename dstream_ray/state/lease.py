"""File-based exclusive lease — the analog of dstream's Azure Blob lease
distributed lock (/root/reference/docs/capability-inventory.md:186-192):
one lease per resource, stale after a TTL, break-on-stale, skip-if-held.

Partition ownership inside one job is structural (one reduce task per
partition per epoch); this lease guards MULTI-JOB safety — two drivers
pointed at the same checkpoint/sink tree.
"""

from __future__ import annotations

import json
import os
import time


class Lease:
    def __init__(self, path: str, owner: str, ttl_s: float = 120.0):
        self.path = path
        self.owner = owner
        self.ttl_s = ttl_s

    def _read(self) -> dict | None:
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def acquire(self) -> bool:
        """True if acquired (fresh, renewed, or broken-stale); False if held
        by a live owner — the caller skips this cycle, like the reference
        skips a locked table."""
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        now = time.time()
        cur = self._read()
        if cur is not None and cur["owner"] != self.owner:
            if now - cur["ts"] < self.ttl_s:
                return False  # held and fresh
            # stale: break it (reference: 2-min stale TTL break)
        tmp = f"{self.path}.{self.owner}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"owner": self.owner, "ts": now}, fh)
        os.replace(tmp, self.path)
        # confirm we won (last-writer-wins on a local fs is atomic)
        cur = self._read()
        return cur is not None and cur["owner"] == self.owner

    def renew(self) -> bool:
        cur = self._read()
        if cur is None or cur["owner"] != self.owner:
            return False
        return self.acquire()

    def release(self) -> None:
        cur = self._read()
        if cur is not None and cur["owner"] == self.owner:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
