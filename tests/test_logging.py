"""Logging stack: torch-free TensorBoard event writer (byte-compatible with
the real tensorboard reader), cometml honesty, RSS monitor."""

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def test_tb_writer_roundtrips_through_tensorboard_reader(tmp_path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    from w2v2_speaker_tpu.runtime.tb_writer import TensorBoardWriter

    w = TensorBoardWriter(tmp_path)
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("train/loss", 0.75, 20)
    w.add_scalar("val/eer", 0.07, 20)
    w.close()

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"train/loss", "val/eer"}
    loss = acc.Scalars("train/loss")
    assert [(e.step, e.value) for e in loss] == [(10, 1.5), (20, 0.75)]
    eer = acc.Scalars("val/eer")
    assert eer[0].step == 20 and eer[0].value == pytest.approx(0.07)


def test_tb_writer_text_roundtrips_through_tensorboard_reader(tmp_path):
    """Text events (tracked-sample transcriptions) must decode through the
    real TensorBoard tensor/text pipeline, not just scalars."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    from w2v2_speaker_tpu.runtime.tb_writer import TensorBoardWriter

    w = TensorBoardWriter(tmp_path)
    w.add_text("train/transcription", "HELLO WORLD", 5)
    w.add_text("train/transcription", "HALLO WORLT", 10)
    w.close()

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    assert "train/transcription" in acc.Tags()["tensors"]
    events = acc.Tensors("train/transcription")
    texts = [
        (e.step, e.tensor_proto.string_val[0].decode()) for e in events
    ]
    assert texts == [(5, "HELLO WORLD"), (10, "HALLO WORLT")]
    # routed to the text plugin
    content = acc.PluginTagToContent("text")
    assert "train/transcription" in content


def test_metrics_logger_writes_events_without_torch(tmp_path, capsys):
    import w2v2_speaker_tpu.runtime.logging as logging_mod
    from w2v2_speaker_tpu.runtime.logging import MetricsLogger

    assert "torch" not in logging_mod.__dict__, "logger must stay torch-free"
    lg = MetricsLogger(log_dir=tmp_path, flush_every=2)
    lg.log_step(1, {"loss": 1.0})
    lg.log_step(2, {"loss": 0.5})
    lg.log_eval(2, {"val_eer": 0.1})
    lg.close()
    out = capsys.readouterr().out
    assert "train step 2" in out and "val step 2" in out
    assert any(p.name.startswith("events.out") for p in tmp_path.iterdir())


def test_crc32c_vectors():
    from w2v2_speaker_tpu.runtime.tb_writer import _crc32c

    # RFC 3720 / iSCSI test vectors
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_use_cometml_raises_when_unavailable(tmp_path):
    """The reference's use_cometml flag must not be silently ignored
    (main.py:371-380); without comet_ml installed it raises."""
    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import run_train_eval

    cfg = load_config(REPO / "config", "train_eval", ["use_cometml=true"])
    with pytest.raises(RuntimeError, match="comet_ml"):
        run_train_eval(cfg)


def test_rss_monitor():
    from w2v2_speaker_tpu.runtime.logging import rss_mb

    assert rss_mb() > 1.0  # this process definitely uses > 1 MiB
