"""Video IO sources/writers (array-backed paths; ffmpeg paths gated)."""

import numpy as np
import pytest

from pmce_tpu.demo import video_io


def test_array_source_roundtrip(rng):
    frames = rng.integers(0, 255, size=(5, 32, 48, 3)).astype(np.uint8)
    src = video_io.ArrayVideoSource(frames, fps=24.0)
    assert (src.height, src.width) == (32, 48)
    out = np.stack(list(src))
    np.testing.assert_array_equal(out, frames)
    assert len(src) == 5


def test_array_writer(rng):
    w = video_io.ArrayVideoWriter()
    frames = rng.integers(0, 255, size=(3, 8, 8, 3)).astype(np.uint8)
    for f in frames:
        w.write(f)
    w.close()
    np.testing.assert_array_equal(np.stack(w.frames), frames)


def test_open_video_dispatch(tmp_path, rng):
    frames = rng.integers(0, 255, size=(2, 8, 8, 3)).astype(np.uint8)
    src = video_io.open_video(frames)
    assert isinstance(src, video_io.ArrayVideoSource)
    p = str(tmp_path / "clip.npy")
    np.save(p, frames)
    src2 = video_io.open_video(p)
    np.testing.assert_array_equal(np.stack(list(src2)), frames)


def test_ffmpeg_paths_gated():
    if video_io.has_ffmpeg():
        pytest.skip("ffmpeg present; gating not exercised")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        video_io.FFmpegVideoWriter("/tmp/x.mp4", 8, 8)
    with pytest.raises(RuntimeError, match="ffmpeg|ffprobe"):
        video_io.FFmpegVideoSource("/tmp/nope.mp4")
