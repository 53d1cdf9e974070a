"""Offline metric table: generated wavs vs ground-truth wavs -> CSV.

Port of hifi-gan/evaluate_metric.py:44-72 (PESQ-nb/STOI/ESTOI mean±std CSV):
computes PESQ-nb (numpy P.862-style, covomix_tpu/util/pesq_nb.py), STOI,
ESTOI, SI-SDR and MCD per pair. Pairs are matched by basename between
--gen_dir and --ref_dir."""

import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401  (compile cache + COVOMIX_FORCE_CPU)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen_dir", required=True)
    p.add_argument("--ref_dir", required=True)
    p.add_argument("--out_csv", default="metrics.csv")
    p.add_argument("--sample_rate", type=int, default=8000)
    args = p.parse_args()

    import numpy as np

    from covomix_tpu.audio import MelConfig, load_wav, mel_spectrogram
    from covomix_tpu.util.metrics import estoi, mcd, si_sdr, stoi
    from covomix_tpu.util.misc import mean_std
    from covomix_tpu.util.pesq_nb import pesq_nb

    mel_cfg = MelConfig(sample_rate=args.sample_rate)
    rows = []
    for gen in sorted(glob.glob(os.path.join(args.gen_dir, "*.wav"))):
        name = os.path.basename(gen).replace("_generated", "")
        ref = os.path.join(args.ref_dir, name)
        if not os.path.isfile(ref):
            continue
        g, _ = load_wav(gen, sr=args.sample_rate)
        r, _ = load_wav(ref, sr=args.sample_rate)
        n = min(len(g), len(r))
        g, r = g[:n], r[:n]
        mg = np.asarray(mel_spectrogram(g[None], mel_cfg))[0].T
        mr = np.asarray(mel_spectrogram(r[None], mel_cfg))[0].T
        rows.append({
            "file": name,
            "pesq_nb_approx": round(pesq_nb(r, g, args.sample_rate), 4),
            "si_sdr": round(si_sdr(r, g), 3),
            "stoi": round(stoi(r, g, args.sample_rate), 4),
            "estoi": round(estoi(r, g, args.sample_rate), 4),
            "mcd_db": round(mcd(mr, mg), 4),
        })
        print(rows[-1])
    if not rows:
        print("no matched pairs", file=sys.stderr)
        sys.exit(1)
    with open(args.out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
        for key in ("pesq_nb_approx", "si_sdr", "stoi", "estoi", "mcd_db"):
            m, s = mean_std(np.asarray([row[key] for row in rows], float))
            f.write(f"# {key}: {m:.4f} +- {s:.4f}\n")
            print(f"{key}: {m:.4f} +- {s:.4f}")
    print(f"wrote {args.out_csv}")


if __name__ == "__main__":
    main()
