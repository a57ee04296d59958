"""Streaming ingest flows over the persistent operator states."""
from __future__ import annotations

import os
import uuid


def incarnation_salt(checkpoint_dir: str) -> str:
    """Per-incarnation partition-label salt, persisted INSIDE the
    checkpoint directory.

    Batch ids are only unique within one checkpoint incarnation; labels
    derived from them must therefore be salted per incarnation. A salt
    derived from the checkpoint PATH (the round-6 form) is stable across
    crash-restarts — good — but also stable across a delete-and-recreate
    of the same path (a common ops reset): batch ids restart at 0 under an
    identical salt and the dynamic partition overwrite silently REPLACES
    the previous incarnation's accepted partitions. Minting a uuid marker
    file on first run and reusing it on restart keeps both properties:
    stable across restarts of the SAME checkpoint (the marker survives
    with it), distinct across incarnations (a recreated dir gets a fresh
    marker). The write is atomic (tmp + rename) so a crash mid-mint never
    leaves a half-written salt.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "_incarnation_id")
    if os.path.exists(marker):
        with open(marker) as f:
            salt = f.read().strip()
        if salt:
            return salt
    salt = uuid.uuid4().hex[:8]
    tmp = marker + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(salt)
    os.replace(tmp, marker)
    return salt
