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
            if not wav:
                raise ValueError(f"manifest record without audio_filepath/audio: {rec}")
            # resolve relative audio paths against the manifest's directory
            # (a bare 'utt.wav' with no out_dir would otherwise target '/')
            wav_dir = os.path.dirname(wav) or "."
            if not os.path.isabs(wav_dir) and not args.out_dir:
                wav_dir = os.path.join(os.path.dirname(os.path.abspath(args.manifest)), wav_dir)
            text = rec.get("text", "")
            name = os.path.basename(wav).rsplit(".wav", 1)[0] + ".txt"
            out = os.path.join(args.out_dir or wav_dir, name)
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            with open(out, "w") as g:
                g.write(text)
            n += 1
    print(f"wrote {n} txt files")


if __name__ == "__main__":
    main()
