"""Native C++ mWER resegmenter: build + behavioral tests."""

import subprocess
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
MWER_DIR = ROOT / "native" / "mwer"
BINARY = MWER_DIR / "mwer_segmenter"


@pytest.fixture(scope="module")
def binary():
    if not BINARY.exists():
        subprocess.run(["make"], cwd=MWER_DIR, check=True)
    return BINARY


def _write_xml(path, docs, is_src=True):
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', "<mteval>"]
    lines.append('<srcset setid="t" srclang="en">' if is_src
                 else '<refset setid="t" srclang="en" trglang="de" refid="ref">')
    for docid, segs in docs:
        lines.append(f'<doc docid="{docid}" genre="lectures">')
        for i, s in enumerate(segs, 1):
            lines.append(f'<seg id="{i}">{s}</seg>')
        lines.append("</doc>")
    lines.append("</srcset>" if is_src else "</refset>")
    lines.append("</mteval>")
    path.write_text("\n".join(lines))


def test_perfect_alignment(binary, tmp_path):
    """Hypothesis identical to reference, but segmented differently."""
    ref_docs = [("talk1", ["der hund läuft schnell", "die katze schläft",
                           "das haus ist groß"])]
    _write_xml(tmp_path / "src.xml", ref_docs, True)
    _write_xml(tmp_path / "ref.xml", ref_docs, False)
    # hypothesis arrives as 2 lines with different segmentation
    (tmp_path / "hyp.txt").write_text(
        "der hund läuft schnell die katze\nschläft das haus ist groß\n"
    )
    subprocess.run(
        [str(binary), "src.xml", "ref.xml", "hyp.txt", "sys", "de",
         "out.xml", "normalize", "1"],
        cwd=tmp_path, check=True,
    )
    segments = (tmp_path / "__segments").read_text().splitlines()
    mref = (tmp_path / "__mreference").read_text().splitlines()
    assert len(segments) == len(mref) == 3
    # perfect hypothesis must realign exactly to the reference segmentation
    assert segments == mref


def test_noisy_alignment_counts(binary, tmp_path):
    ref_docs = [
        ("talk1", ["hello world this is a test", "second segment here"]),
        ("talk2", ["another talk entirely", "with two segments"]),
    ]
    _write_xml(tmp_path / "src.xml", ref_docs, True)
    _write_xml(tmp_path / "ref.xml", ref_docs, False)
    (tmp_path / "hyp.txt").write_text(
        "hello world these is test second\nsegments here\n"
        "an other talk entirely\nwith two segment\n"
    )
    subprocess.run(
        [str(binary), "src.xml", "ref.xml", "hyp.txt", "sys", "de",
         "out.xml", "normalize", "1"],
        cwd=tmp_path, check=True,
    )
    segments = (tmp_path / "__segments").read_text().splitlines()
    mref = (tmp_path / "__mreference").read_text().splitlines()
    assert len(segments) == len(mref) == 4
    # every hypothesis word is preserved, in order
    hyp_words = " ".join(segments).split()
    orig = "hello world these is test second segments here an other talk entirely with two segment".split()
    assert hyp_words == orig
    # the aligned xml exists and contains 4 segments
    xml = (tmp_path / "out.xml").read_text()
    assert xml.count("<seg") == 4


def test_normalization_lowercases_and_splits_punct(binary, tmp_path):
    ref_docs = [("t", ["hello , world !", "good bye ."])]
    _write_xml(tmp_path / "src.xml", ref_docs, True)
    _write_xml(tmp_path / "ref.xml", ref_docs, False)
    (tmp_path / "hyp.txt").write_text("Hello, world! Good bye.\n")
    subprocess.run(
        [str(binary), "src.xml", "ref.xml", "hyp.txt", "sys", "de",
         "out.xml", "normalize", "0"],
        cwd=tmp_path, check=True,
    )
    segments = (tmp_path / "__segments").read_text().splitlines()
    assert segments == ["hello , world !", "good bye ."]


def test_get_statistics_cli(tmp_path, monkeypatch):
    """cli/get_statistics.main: mWER -mref alignment of __translation vs
    __mreference, per-sentence BLEU, BERTScore (stubbed), and the
    sentence_statistics.tsv layout (reference
    lib/analysis/get_statistics.py:18-76)."""
    import csv

    import yaml

    work = tmp_path
    # 2 hypothesis sentences, 2 reference segments, same words
    (work / "__translation").write_text(
        "der hund läuft schnell\ndie katze schläft\n")
    (work / "__mreference").write_text(
        "der hund läuft\nschnell die katze schläft\n")
    yaml.safe_dump(
        [{"duration": 3.5, "offset": 0.0, "rW": 0, "uW": 0,
          "speaker_id": "NA", "wav": "t.wav"},
         {"duration": 2.0, "offset": 3.5, "rW": 0, "uW": 0,
          "speaker_id": "NA", "wav": "t.wav"}],
        open(work / "custom_segments.yaml", "w"))

    from wav2vecsegmenter_tpu.cli import get_statistics as gs

    monkeypatch.setattr(
        gs, "score_sentence_bertscore",
        lambda *a, **k: ([0.5, 0.6], [0.4, 0.7], [0.45, 0.65]))
    out = gs.main([str(work), "de"])

    assert out.exists()
    rows = list(csv.reader(open(out), delimiter="\t"))
    assert rows[0] == ["Duration", "Hyp", "Ref", "BLEU", "BERTScore(P)",
                       "BERTScore(R)", "BERTScore(F1)"]
    assert len(rows) == 3
    assert rows[1][0] == "3.5" and rows[2][0] == "2.0"
    # Hyp column = __translation lines; Ref column = the realigned
    # __segments lines the mWER -mref pass produced
    segs = (work / "statistics" / "__segments").read_text().splitlines()
    assert [rows[1][1], rows[2][1]] == [
        "der hund läuft schnell", "die katze schläft"]
    assert [rows[1][2], rows[2][2]] == segs
    assert segs == ["der hund läuft schnell", "die katze schläft"]
    assert rows[1][4] == "0.5" and rows[2][6] == "0.65"
