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

    def _write(self, now: float) -> None:
        tmp = f"{self.path}.{self.owner}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"owner": self.owner, "ts": now}, fh)
        os.replace(tmp, self.path)

    def acquire(self) -> bool:
        """True if acquired (fresh, renewed, or broken-stale); False if held
        by a live owner — the caller skips this cycle, like the reference
        skips a locked table.

        The stale-break is ATOMIC: breakers race on an O_CREAT|O_EXCL
        sentinel keyed by the stale lease's timestamp, so exactly one breaker
        wins even when several observe the same stale lease (write-then-
        read-confirm was last-writer-wins — both could believe they held it).
        """
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        now = time.time()
        cur = self._read()
        if cur is None:
            # free: exclusive create so two fresh acquirers can't both win
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as fh:
                    json.dump({"owner": self.owner, "ts": now}, fh)
                return True
            except FileExistsError:
                cur = self._read()
                if cur is None:
                    return False  # creator mid-write; let the caller retry
        if cur["owner"] == self.owner:
            self._write(now)  # renewal: we own it, no competing writer
            return True
        if now - cur["ts"] < self.ttl_s:
            return False  # held and fresh
        # stale: exactly one breaker may win this generation
        sentinel = f"{self.path}.break-{int(cur['ts'] * 1e6)}"
        try:
            fd = os.open(sentinel, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            # another breaker won this generation — unless IT crashed
            # mid-break and its sentinel is itself stale
            try:
                if time.time() - os.path.getmtime(sentinel) < self.ttl_s:
                    return False
                os.remove(sentinel)
            except FileNotFoundError:
                pass
            return self.acquire()
        try:
            # we won the sentinel for generation cur — but a racer that won
            # an EARLIER generation may have broken the lease between our
            # read and our sentinel create (it then removed its sentinel,
            # letting ours succeed). Only overwrite if the lease is still
            # exactly the stale record we observed; otherwise someone holds
            # a fresh lease and we must not stomp it.
            cur2 = self._read()
            if cur2 is None or cur2 != cur:
                return False
            self._write(now)
            cur3 = self._read()
            return cur3 is not None and cur3["owner"] == self.owner
        finally:
            try:
                os.remove(sentinel)
            except FileNotFoundError:
                pass

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
