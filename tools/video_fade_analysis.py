"""Measurement behind the round-13 video_scene_detect decisions
(VERDICT r12 #8): can a planted k-frame FADE (gradual transition) stay
quiet under the dHash-delta boundary rule, and where should the
boundary threshold sit?

Three experiments, all pure numpy/duckdb (no Spark), reproducing the
numbers recorded in SCALE.md:

1. --enumerate: EXHAUSTIVE worst-case per-step hamming for a seed
   drift of delta, over ALL (w in 9..64, h in 8..48, seed mod 256) —
   588,544 combos, complete because encode_bmp pixels are mod-256 in
   the seed.  Result: even delta=1 (the within-scene drift) reaches
   hamming 16 on 66 adversarial combos; delta=2 reaches 19.  A
   UNIVERSALLY quiet fade therefore does not exist at any threshold
   a hard cut can also clear.

2. --thresholds: on the actual fixtures, the separation gap between
   steady steps (max 9, the sf0.01 outlier) and planted-cut steps
   (min 14), and the false/missed boundary counts at candidate
   thresholds.  Result: threshold 8 (the simhash near-dup default the
   operator originally borrowed) produces 1 false boundary at sf0.01;
   threshold 11 — the midpoint of the measured gap — is exact
   (0 false, 0 missed) on sf0.001/sf0.01/sf0.1/sf1.  This is why
   _SCENE_HAM is 11.

3. --fade: plant a fade of FADE-per-frame seed drift (total spread of
   the cut's 128 over the tail of fc==0 clips) and measure the
   per-step distribution against the cut range.  Result: at EVERY
   rate (6/8/10/12/16 per frame) the fade's max step (19-26) overlaps
   or exceeds the cut minimum (14) — single-step thresholds cannot
   order fades below cuts on this content, so the VERDICT-suggested
   "planted fade that stays quiet at the same threshold" was built,
   measured, and REJECTED with these numbers (the classic
   gradual-transition weakness of pairwise-difference detectors;
   twin-comparison's cumulative run-sum DOES separate — fade run-sum
   >= 31 vs steady run-sum <= 20 at FADE=10 — but its candidate band
   needs per-step fade < cut, which this content refuses).

Usage: python tools/video_fade_analysis.py [--enumerate] [--thresholds]
       [--fade] [sf_dirs...]   (no flags = run all three)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".scale_data/sf1"),
]

N_FRAMES, CAP, JUMP = 12, 1200, 128


def _grid(w: int, h: int) -> np.ndarray:
    r, c = np.arange(8), np.arange(9)
    return (h - 1 - (r * h // 8))[:, None] * w + (c * w // 9)[None, :]


def step_ham(w: int, h: int, s: int, delta: int) -> int:
    """dHash hamming between encode_bmp(w,h,s) and encode_bmp(w,h,s+delta),
    via the analytic pixel formula (the oracle's arithmetic)."""
    k = _grid(w, h)
    va, vb = (k * 31 + s) % 256, (k * 31 + s + delta) % 256
    ba, bb = va[:, 1:] > va[:, :-1], vb[:, 1:] > vb[:, :-1]
    return int((ba != bb).sum())


def enumerate_worst(delta: int) -> tuple[int, int]:
    """(worst hamming, #combos over 8) across ALL (w, h, seed mod 256)."""
    worst = over8 = 0
    for w in range(9, 65):
        for h in range(8, 49):
            k = _grid(w, h)
            s = np.arange(256)[:, None, None]
            v = (k[None] * 31 + s) % 256
            bits = v[:, :, 1:] > v[:, :, :-1]
            ham = (bits != np.roll(bits, -delta, axis=0)).sum(axis=(1, 2))
            worst = max(worst, int(ham.max()))
            over8 += int((ham > 8).sum())
    return worst, over8


def _clips(sf_dir: str):
    return duckdb.sql(
        "SELECT doc_id, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < {CAP}"
    ).fetchall()


def threshold_report(sf_dirs) -> None:
    for sf in sf_dirs:
        steady_max, cut_min = 0, 99
        counts = {t: [0, 0] for t in (8, 11)}  # threshold -> [false, missed]
        for d, s0 in _clips(sf):
            w, h, fc = d % 56 + 9, d % 41 + 8, d % N_FRAMES
            for f in range(1, N_FRAMES):
                sp = s0 + (f - 1) + (JUMP if fc > 0 and f - 1 >= fc else 0)
                sc = s0 + f + (JUMP if fc > 0 and f >= fc else 0)
                v = step_ham(w, h, sp, sc - sp)
                if fc > 0 and f == fc:
                    cut_min = min(cut_min, v)
                    for t in counts:
                        counts[t][1] += v <= t
                else:
                    steady_max = max(steady_max, v)
                    for t in counts:
                        counts[t][0] += v > t
        print(
            f"{sf}: steady_max={steady_max} cut_min={cut_min} "
            + " ".join(
                f"thr{t}: false={c[0]} missed={c[1]}"
                for t, c in counts.items()
            )
        )


def fade_report(sf_dirs, rates=(6, 8, 10, 12, 16)) -> None:
    for rate in rates:
        fade_max, cut_min = 0, 99
        steady_runsum_max, fade_runsum_min = 0, 999
        for sf in sf_dirs:
            for d, s0 in _clips(sf):
                w, h, fc = d % 56 + 9, d % 41 + 8, d % N_FRAMES
                seeds = [
                    s0 + f + (
                        rate * max(0, f - 3) if fc == 0
                        else (JUMP if f >= fc else 0)
                    )
                    for f in range(N_FRAMES)
                ]
                srun = frun = 0
                for f in range(1, N_FRAMES):
                    v = step_ham(w, h, seeds[f - 1], seeds[f] - seeds[f - 1])
                    if fc == 0 and f >= 4:
                        fade_max, frun = max(fade_max, v), frun + v
                    elif fc > 0 and f == fc:
                        cut_min = min(cut_min, v)
                    else:
                        steady_runsum_max = max(steady_runsum_max, srun + v)
                        srun += v
                if fc == 0:
                    fade_runsum_min = min(fade_runsum_min, frun)
        sep = "OVERLAPS" if fade_max >= cut_min else "separates"
        print(
            f"fade rate {rate}/frame: fade step max={fade_max} vs "
            f"cut min={cut_min} -> {sep}; run-sums: fade>={fade_runsum_min} "
            f"steady<={steady_runsum_max}"
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if a.startswith("--")]
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        d for d in DEFAULT_SF if os.path.isdir(d)
    ]
    run_all = not args
    if run_all or "--enumerate" in args:
        for d in (1, 2, 4):
            worst, over8 = enumerate_worst(d)
            print(
                f"delta={d}: worst hamming {worst} over all 588,544 "
                f"(w,h,seed) combos; {over8} combos exceed 8"
            )
    if run_all or "--thresholds" in args:
        threshold_report(dirs)
    if run_all or "--fade" in args:
        fade_report(dirs)


if __name__ == "__main__":
    main()
