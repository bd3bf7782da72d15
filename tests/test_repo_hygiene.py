"""Guard against committed media artifacts.

Round-3 review found accidental demo outputs (an H.264 elementary stream
named ``--cpu`` and its MP4 mux) tracked at HEAD.  This test pins the
cleanup: no file tracked by git may be an H.264 bitstream or an MP4
container, by extension or by content sniff.
"""

import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

MEDIA_EXTENSIONS = {".h264", ".264", ".mp4", ".yuv", ".avc", ".annexb"}


def _tracked_files():
    out = subprocess.run(
        ["git", "ls-files", "-z"], cwd=REPO, capture_output=True, check=True
    ).stdout
    return [p for p in out.decode().split("\0") if p]


def test_no_tracked_media_artifacts():
    offenders = []
    for rel in _tracked_files():
        path = REPO / rel
        if path.suffix.lower() in MEDIA_EXTENSIONS:
            offenders.append(f"{rel} (extension)")
            continue
        if not path.is_file():
            continue
        with open(path, "rb") as f:
            head = f.read(12)
        # Annex-B start code at byte 0 (3- or 4-byte form).
        if head.startswith(b"\x00\x00\x00\x01") or head.startswith(b"\x00\x00\x01"):
            offenders.append(f"{rel} (Annex-B start code)")
        # MP4/ISO-BMFF: 'ftyp' box at offset 4.
        elif len(head) >= 8 and head[4:8] == b"ftyp":
            offenders.append(f"{rel} (MP4 ftyp box)")
    assert not offenders, f"media artifacts tracked at HEAD: {offenders}"
