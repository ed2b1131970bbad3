"""Regenerate the SQL_MEDIA_FEATURES pinned golden in __spark_entry__.py.

Replays the synthetic_media generator contract (numpy default_rng(42),
n=64) and the fake_decode feature math (16-bucket fold-mean / 255) in
plain numpy — deliberately WITHOUT importing the Spark operator — so the
pin is an independent recomputation, not a snapshot of the code under
test. The left-fold double sum mirrors F.aggregate(feature, lit(0.0),
a + x); round(_, 6) mirrors F.round.

Usage: python scripts/gen_media_oracle.py  # prints the VALUES rows
"""

from __future__ import annotations

import numpy as np

N, DIM, SEED = 64, 16, 42


def main() -> None:
    rng = np.random.default_rng(SEED)
    rows = []
    for i in range(N):
        kind = ["image", "audio", "video"][i % 3]
        size = int(rng.integers(128, 4096))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        # consume the metadata draws in generator order (values unused here)
        if kind == "image":
            rng.integers(32, 512)
            rng.integers(32, 512)
        else:
            rng.integers(1000, 8000)
        arr = np.frombuffer(payload, dtype=np.uint8)
        pad = (-len(arr)) % DIM
        folded = np.pad(arr, (0, pad)).reshape(-1, DIM)
        feats = (folded.mean(axis=0) / 255.0).astype(np.float32)
        acc = 0.0
        for x in feats:
            acc += float(x)
        rows.append((i, len(payload), round(acc, 6)))

    for j in range(0, N, 3):
        chunk = rows[j : j + 3]
        print("  " + " ".join(f"({m}, {b}, {s})," for m, b, s in chunk))


if __name__ == "__main__":
    main()
