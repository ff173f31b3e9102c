#!/usr/bin/env python
"""Europarl-ST -> MuST-C format converter.

Behavioral contract: reference scripts/europarl_to_mustc_format_converter.py
(:8-98) — converts a Europarl-ST split (segments.lst + per-speech audio) into
the MuST-C directory layout this framework's infer_data configs expect
(txt/{split}.yaml + txt/{split}.{src,tgt} + wav/).

Audio transcoding: the reference uses pydub/ffmpeg; here wav inputs are
handled natively and other formats are transcoded through ffmpeg if present
on PATH (Europarl-ST ships m4a).
"""

from __future__ import annotations

import argparse
import itertools
import shutil
import subprocess
from pathlib import Path


def _transcode(src: Path, dst: Path, frame_rate: int, mono: bool) -> None:
    cmd = ["ffmpeg", "-y", "-loglevel", "error", "-i", str(src),
           "-ar", str(frame_rate)]
    if mono:
        cmd += ["-ac", "1"]
    cmd.append(str(dst))
    subprocess.run(cmd, check=True)


def process(args) -> None:
    audio_dir = Path(args.europarl_data_root) / args.src_lang / "audios"
    segments_dir = (Path(args.europarl_data_root) / args.src_lang /
                    args.tgt_lang / args.split)
    assert audio_dir.exists(), f"Audio directory {audio_dir} does not exist"
    assert segments_dir.exists(), f"Segments dir {segments_dir} does not exist"

    output_dir = (Path(args.output_data_root) /
                  f"{args.src_lang}-{args.tgt_lang}" / "data" / args.split)
    output_dir.mkdir(parents=True, exist_ok=True)

    segments_data = [
        line.strip().split()
        for line in (segments_dir / "segments.lst").read_text().splitlines()
        if line.strip()
    ]

    lines = []
    for tokens in segments_data:
        audio_file, start, end = tokens[0], float(tokens[1]), float(tokens[2])
        lines.append(
            f"- {{duration: {end - start:.6f}, offset: {start:.6f}, "
            f"speaker_id: {audio_file}, "
            f"{args.audio_format}: {audio_file}.{args.audio_format}}}"
        )

    txt_dir = output_dir / "txt"
    txt_dir.mkdir(parents=True, exist_ok=True)
    (txt_dir / f"{args.split}.{args.audio_format}.yaml").write_text(
        "\n".join(lines))
    shutil.copyfile(segments_dir / f"segments.{args.src_lang}",
                    txt_dir / f"{args.split}.{args.src_lang}")
    shutil.copyfile(segments_dir / f"segments.{args.tgt_lang}",
                    txt_dir / f"{args.split}.{args.tgt_lang}")

    out_audio_dir = output_dir / args.audio_format
    out_audio_dir.mkdir(parents=True, exist_ok=True)
    orig_format = next(audio_dir.glob("*.*")).suffix[1:]
    for speech_id, _ in itertools.groupby(segments_data, lambda x: x[0]):
        src = audio_dir / f"{speech_id}.{orig_format}"
        dst = out_audio_dir / f"{speech_id}.{args.audio_format}"
        if orig_format == args.audio_format:
            shutil.copyfile(src, dst)
        else:
            _transcode(src, dst, args.frame_rate, not args.keep_channels)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--europarl-data-root", "-d", required=True)
    parser.add_argument("--output-data-root", "-o", required=True)
    parser.add_argument("--src-lang", "-s", required=True)
    parser.add_argument("--tgt-lang", "-t", required=True)
    parser.add_argument("--split", "-sp", required=True)
    parser.add_argument("--audio-format", "-a", default="wav",
                        choices=["m4a", "wav"])
    parser.add_argument("--frame-rate", "-r", type=int, default=16000)
    parser.add_argument("--keep-channels", "-k", action="store_true")
    process(parser.parse_args())


if __name__ == "__main__":
    main()
