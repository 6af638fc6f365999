"""Input-monitor depth (VERDICT r3 directive 5): per-preprocessor debug
artifacts for the first pipeline samples and the auto-dump of the offending
batch when a training step raises (reference
callbacks/input_monitor_callback.py:93-156,
speaker_recognition_module.py:187-203)."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tests.test_runtime import _build_corpus

    root = tmp_path_factory.mktemp("input_monitor_corpus")
    return _build_corpus(root, n_spk=6, test_spk=2)


def _overrides(corpus, tmp_path, extra):
    from tests.test_runtime import _common_overrides

    return _common_overrides(
        corpus, tmp_path, ["+experiment=speaker_dummy"] + extra
    )


def test_per_sample_pipeline_artifacts(corpus, tmp_path):
    """dump_first_batch=true writes, beside the collated batch dump, a
    per-sample directory of numbered stage artifacts: original waveform,
    each augmentation op's output, chunk, normalized chunk — each as .npy +
    stats .txt + playable .wav (reference side_info.pipeline_progress +
    debug writers, input_monitor_callback.py:120-145)."""
    import run as run_cli

    run_cli.main(
        _overrides(
            corpus,
            tmp_path,
            [
                "trainer.dump_first_batch=true",
                "trainer.max_steps=2",
                "trainer.val_check_interval=2",
                "data/pipeline=xvector_dropout_augment_pipeline",
                "data.pipeline.chunk_length_sec=1.0",
            ],
        )
    )
    # collated batch dump unchanged
    assert (tmp_path / "first_batch" / "batch_features.npy").exists()
    per_sample = tmp_path / "first_batch" / "per_sample"
    sample_dirs = sorted(p for p in per_sample.iterdir() if p.is_dir())
    assert sample_dirs, "no per-sample artifact directories written"
    for d in sample_dirs:
        names = sorted(p.name for p in d.iterdir())
        stages = {n.split("_", 1)[1].rsplit(".", 1)[0]
                  for n in names if n.endswith(".npy")}
        assert "original" in stages
        # the dropout/speed study pipeline yields intermediates for every op
        assert any(s.startswith("augment_") for s in stages)
        assert any(s.startswith("chunk") for s in stages)
        assert any(s.startswith("normalize") for s in stages)
        # every stage has raw array + stats + playable render
        for n in list(names):
            if n.endswith(".npy"):
                base = n[:-4]
                assert f"{base}.txt" in names
                assert f"{base}.wav" in names
        # stage artifacts are real audio-sized arrays
        orig = next(n for n in names if n.endswith("original.npy"))
        arr = np.load(d / orig)
        assert arr.ndim == 1 and arr.size > 1000

    # capture is capped: at most 4 sample directories by default
    assert len(sample_dirs) <= 4


def test_failed_train_step_dumps_offending_batch(corpus, tmp_path, capsys):
    """When a training step raises, the raw (un-stripped) batch is dumped —
    tensors, stats, and keys — before the exception propagates (reference
    speaker_recognition_module.py:187-203)."""
    import run as run_cli
    from w2v2_speaker_tpu.runtime import experiment as exp

    real_make = exp.make_train_step

    def broken_make(*args, **kwargs):
        fn = real_make(*args, **kwargs)

        def step(state, batch):
            raise RuntimeError("synthetic training-step failure")

        return step

    orig = exp.make_train_step
    exp.make_train_step = broken_make
    try:
        with pytest.raises(RuntimeError, match="synthetic training-step"):
            run_cli.main(_overrides(corpus, tmp_path, []))
    finally:
        exp.make_train_step = orig

    out = capsys.readouterr().out
    assert "offending batch(es) dumped to" in out
    dump_dir = tmp_path / "debug_batch" / "train_step"
    assert (dump_dir / "batch_features.npy").exists()
    assert (dump_dir / "batch_labels.npy").exists()
    # the raw batch kept its host-only fields: sample keys are on disk
    keys_files = list(dump_dir.glob("batch_keys*"))
    assert keys_files, "sample keys missing from the crash dump"


def test_speech_pipeline_per_sample_artifacts(tmp_path):
    """The LibriSpeech pipeline exposes the same debug-capture hook as the
    VoxCeleb one (reference input monitor is module-agnostic,
    input_monitor_callback.py:36-156): decoded audio + transcription +
    token ids per captured sample, with depth/dir from the callbacks
    config (config/callbacks/debugging.yaml)."""
    import run as run_cli
    from tests.test_runtime_speech import _build_librispeech

    raw = tmp_path / "ls"
    _build_librispeech(raw)
    mon_dir = tmp_path / "mon"
    run_cli.main(
        [
            "+experiment=speech_wav2vec2_ctc",
            "network.wav2vec2_size=tiny",
            "network.layerdrop=0.0",
            f"data.module.train_dir={raw}",
            f"data.module.val_clean_dir={raw}",
            "data.module.val_other_dir=null",
            "data.module.test_clean_dir=null",
            "data.module.test_other_dir=null",
            f"data.module.shards_dir={tmp_path / 'shards'}",
            "data.dataloader.train_max_num_samples=64000",
            "data.dataloader.queue_size=12",
            "data.dataloader.pad_to_multiple=1600",
            "trainer=debug_trainer",
            "trainer.max_steps=2",
            "trainer.val_check_interval=2",
            "trainer.precision=f32",
            "trainer.dump_first_batch=true",
            f"trainer.checkpoint_dir={tmp_path / 'ckpt'}",
            "callbacks=debugging",
            "callbacks.input_monitor.max_samples=2",
            f"callbacks.input_monitor.out_dir={mon_dir}",
            "eval_model=false",
            "seed=1",
        ]
    )
    sample_dirs = sorted(p for p in mon_dir.iterdir() if p.is_dir())
    assert sample_dirs, "no per-sample artifact directories written"
    # max_samples knob respected (not the hardwired default of 4)
    assert len(sample_dirs) <= 2
    for d in sample_dirs:
        names = sorted(p.name for p in d.iterdir())
        stages = {n.split("_", 1)[1].rsplit(".", 1)[0] for n in names}
        assert {"original", "transcription", "tokens"} <= stages
        # one stage chain per key: repeat pipeline passes (the example
        # batch drawn for state init, later epochs) must not append
        # duplicate artifacts
        assert sum(n.endswith("original.npy") for n in names) == 1
        # audio stage has a playable render; the token stage must NOT
        # (ids are not audio)
        assert any(n.endswith("original.wav") for n in names)
        assert not any(n.endswith("tokens.wav") for n in names)
        # the transcript is the actual text
        txt = next(n for n in names if n.endswith("transcription.txt"))
        assert (d / txt).read_text().strip()
        tok = np.load(d / next(n for n in names if n.endswith("tokens.npy")))
        assert tok.ndim == 1 and tok.size > 0


def test_input_monitor_knobs_reach_speaker_pipeline(corpus, tmp_path):
    """callbacks.input_monitor.{max_samples,out_dir} tune the VoxCeleb
    capture too (VERDICT r4 weak 5: the knobs were hardwired)."""
    import run as run_cli

    mon_dir = tmp_path / "mon_spk"
    run_cli.main(
        _overrides(
            corpus,
            tmp_path,
            [
                "trainer.dump_first_batch=true",
                "trainer.max_steps=2",
                "trainer.val_check_interval=2",
                "callbacks=debugging",
                "callbacks.input_monitor.max_samples=1",
                f"callbacks.input_monitor.out_dir={mon_dir}",
            ],
        )
    )
    sample_dirs = sorted(p for p in mon_dir.iterdir() if p.is_dir())
    assert len(sample_dirs) == 1


def test_concurrent_duplicate_key_does_not_truncate_chain(tmp_path):
    """A key drawn twice in one epoch (pairs/triplet sampling) can hit two
    ParallelMap workers concurrently; the duplicate occurrence on the
    other worker must be ignored — not mark the key done and truncate the
    owner worker's in-flight stage chain to a lone 00_original."""
    import threading

    from w2v2_speaker_tpu.runtime.debug import PipelineDebugCapture

    cap = PipelineDebugCapture(tmp_path, max_samples=2)
    wav = np.zeros(8, np.float32)

    cap.record("k", "original", wav)
    # duplicate occurrence lands on another worker mid-chain
    t = threading.Thread(target=cap.record, args=("k", "original", wav))
    t.start()
    t.join()
    cap.record("k", "chunk0", wav[:4])  # owner's chain continues

    d = tmp_path / "k"
    assert (d / "00_original.npy").exists()
    assert (d / "01_chunk0.npy").exists(), "owner chain was truncated"
    # the duplicate pass itself appended nothing
    assert not (d / "01_original.npy").exists()

    # the owner's OWN second pass (later epoch / eval re-read) still
    # finalizes the chain: no duplicate artifacts appended
    cap.record("k", "original", wav)
    cap.record("k", "chunk0", wav[:4])
    assert not (d / "02_original.npy").exists()
    assert not (d / "02_chunk0.npy").exists()

    # max_samples=0: valid "no per-sample capture" setting
    cap0 = PipelineDebugCapture(tmp_path / "zero", max_samples=0)
    assert not cap0.wants("a")
    cap0.record("a", "original", wav)
    assert not (tmp_path / "zero").exists()
