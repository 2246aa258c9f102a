"""Deterministic synthetic media table (multimodal stub corpus).

Pure function of (seed, n_rows), same determinism contract as
datagen/pages.py. Rows carry the FAKEMEDIA container documented in
operators/multimodal.py; planted duplicate classes let tests assert
that payload-level near-dups survive feature extraction + embedding
near-dup detection end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mediaduplicatefinder_spark.operators.multimodal import pack_media


def generate_media(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """media(media_id, kind, payload, dup_class) — dup_class > 0 marks
    planted near-identical payload groups (same base bytes, few flips)."""
    rng = np.random.RandomState(seed)
    rows = []
    media_id = 0
    dup_class = 0
    while len(rows) < n_rows:
        kind = int(rng.randint(0, 3))
        w, h = int(rng.randint(16, 512)), int(rng.randint(16, 512))
        n_frames = int(rng.randint(24, 240)) if kind == 2 else (1 if kind == 0 else 0)
        body = rng.randint(0, 256, size=int(rng.randint(64, 1024))).astype(np.uint8)
        if rng.uniform() < 0.2 and len(rows) + 2 <= n_rows:
            dup_class += 1
            rows.append(
                (media_id, ["image", "audio", "video"][kind],
                 pack_media(kind, w, h, n_frames, body.tobytes()), dup_class)
            )
            media_id += 1
            mutated = body.copy()
            flip = rng.randint(0, len(mutated), size=max(1, len(mutated) // 100))
            mutated[flip] = rng.randint(0, 256, size=len(flip))
            rows.append(
                (media_id, ["image", "audio", "video"][kind],
                 pack_media(kind, w, h, n_frames, mutated.tobytes()), dup_class)
            )
            media_id += 1
        else:
            rows.append(
                (media_id, ["image", "audio", "video"][kind],
                 pack_media(kind, w, h, n_frames, body.tobytes()), 0)
            )
            media_id += 1
    return pd.DataFrame(
        rows[:n_rows], columns=["media_id", "kind", "payload", "dup_class"]
    )
