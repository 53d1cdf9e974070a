"""Manifest JSONL -> per-utterance .txt files (port of data_preparation/save_txt.sh:
the awk/xargs pipeline extracting "text" fields from a manifest into sibling txts)."""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True, help="jsonl with audio_filepath + text fields")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args()
    n = 0
    with open(args.manifest) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            wav = rec.get("audio_filepath") or rec.get("audio")
            text = rec.get("text", "")
            out = (args.out_dir or os.path.dirname(wav)) + "/" + os.path.basename(wav).replace(".wav", ".txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as g:
                g.write(text)
            n += 1
    print(f"wrote {n} txt files")


if __name__ == "__main__":
    main()
