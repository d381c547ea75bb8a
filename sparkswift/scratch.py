"""Fixture-scaffolding scratch directories on the fastest local mount.

The suite's file-corpus fixtures (synth media corpora, streaming
micro-batch slices, per-run checkpoints, store snapshots) are
ephemeral per-run scaffolding, not query data. On the default /tmp
(journaled ext4) their create/unlink traffic is the slowest thing
they do — measured this round: a 5 000-file corpus delete running
beside the next query's writes cost that query ~2 s of journal
contention, and 590 k accumulated fixture files degraded st38's
median from 11.6 s to 17.2 s. tmpfs (/dev/shm) makes both the
writes and the deletes memory operations with zero journal pressure.

Production deployments point ``SPARK_GRAFT_SCRATCH`` at whatever
local NVMe scratch the cluster images provide (the same knob pattern
as Spark's own ``spark.local.dir``); the automatic /dev/shm pick is
just the best local default. Query DATA never lives here — inputs
come from the sf dir and results go through the engine.
"""

from __future__ import annotations

import os
import tempfile


def scratch_base() -> str | None:
    """The configured scratch root: $SPARK_GRAFT_SCRATCH, else
    /dev/shm when present, else None (tempfile's default)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    return "/dev/shm" if os.path.isdir("/dev/shm") else None


def mkscratch(prefix: str) -> str:
    """``tempfile.mkdtemp`` on the scratch mount."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_base())
