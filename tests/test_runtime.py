"""Runtime: config composition (Hydra grammar) + run.py / predict.py CLIs
end-to-end on a synthetic on-disk dataset."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from w2v2_speaker_tpu.runtime.config import ConfigError, load_config

CONFIG_DIR = REPO / "config"
SR = 16000


# ------------------------------------------------------------------ config

def test_default_composition():
    cfg = load_config(CONFIG_DIR, "train_eval", [])
    assert cfg["network"]["name"] == "wav2vec2_fc"
    assert cfg["optim"]["loss"]["name"] == "cross_entropy"
    assert cfg["optim"]["algo"]["name"] == "adam"
    assert cfg["trainer"]["max_steps"] == 100000
    assert cfg["data"]["module"]["name"] == "voxceleb"
    # env default + interpolation
    assert cfg["data"]["module"]["data_dir"].startswith("data/")
    # random_uuid resolver
    assert len(cfg["experiment_name"]) == 36


def test_experiment_preset_overrides():
    cfg = load_config(
        CONFIG_DIR, "train_eval", ["+experiment=speaker_xvector"]
    )
    assert cfg["network"]["name"] == "xvector"
    assert cfg["optim"]["algo"]["lr"] == pytest.approx(4e-4)
    assert cfg["trainer"]["precision"] == "f32"
    assert cfg["project_name"] == "xvector-sv-ce"


def test_group_swap_and_dotted_override():
    cfg = load_config(
        CONFIG_DIR,
        "train_eval",
        [
            "network=ecapa_tdnn",
            "optim.loss=aam_softmax",
            "trainer.max_steps=123",
            "optim.algo.lr=0.5",
            "network.lin_neurons=96",
        ],
    )
    assert cfg["network"]["name"] == "ecapa_tdnn"
    assert cfg["network"]["lin_neurons"] == 96
    assert cfg["optim"]["loss"]["name"] == "aam_softmax"
    assert cfg["trainer"]["max_steps"] == 123
    assert cfg["optim"]["algo"]["lr"] == 0.5


def test_env_resolver(monkeypatch):
    monkeypatch.setenv("DATA_FOLDER", "/somewhere")
    cfg = load_config(CONFIG_DIR, "train_eval", [])
    assert cfg["data"]["module"]["data_dir"] == "/somewhere/voxceleb/wav"


def test_divide_resolvers(tmp_path):
    (tmp_path / "t.yaml").write_text(
        "a: 10\nb: 4\nc: ${divide:${a},${b}}\nd: ${idivide:${a},${b}}\n"
    )
    cfg = load_config(tmp_path, "t", [])
    assert cfg["c"] == 2.5
    assert cfg["d"] == 2


def test_bad_override_and_missing_group():
    with pytest.raises(ConfigError):
        load_config(CONFIG_DIR, "train_eval", ["notakeyvalue"])
    with pytest.raises(ConfigError):
        load_config(CONFIG_DIR, "train_eval", ["network=not_a_network"])
    with pytest.raises(ConfigError):
        load_config(CONFIG_DIR, "train_eval", ["+experiment=nope"])


# --------------------------------------------------------------- run.py e2e

def _build_corpus(root: pathlib.Path, n_spk=9, test_spk=3):
    from w2v2_speaker_tpu.data.io import write_wav

    rng = np.random.default_rng(0)
    freqs = rng.uniform(200, 3500, size=(n_spk, 3))
    wav_dir = root / "wav"
    for s in range(n_spk):
        for y in range(3):
            for u in range(3):
                t = np.arange(int(SR * rng.uniform(1.2, 1.8))) / SR
                sig = sum(
                    np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
                    for f in freqs[s]
                )
                wav = 0.2 * (sig + 0.4 * rng.normal(size=t.shape))
                p = wav_dir / f"id{s:05d}/yt{y}/{u:05d}.wav"
                p.parent.mkdir(parents=True, exist_ok=True)
                write_wav(p, wav.astype(np.float32), SR)
    test_ids = [f"id{s:05d}" for s in range(n_spk - test_spk, n_spk)]
    lines = []
    for i, spk in enumerate(test_ids):
        lines.append(f"1 {spk}/yt0/00000.wav {spk}/yt1/00001.wav")
        other = test_ids[(i + 1) % len(test_ids)]
        lines.append(f"0 {spk}/yt0/00000.wav {other}/yt1/00002.wav")
    (root / "trials.txt").write_text("\n".join(lines) + "\n")
    return wav_dir, root / "trials.txt"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("runtime_corpus")
    return _build_corpus(root)


def _common_overrides(corpus, tmp_path, extra):
    wav_dir, trials = corpus
    return [
        f"data.module.data_dir={wav_dir}",
        f"data.module.shards_dir={tmp_path / 'shards'}",
        f"data.module.test_trial_path={trials}",
        "data.module.train_val_ratio=0.7",
        "data.module.eer_validation_pairs=12",
        "data.shards.samples_per_shard=8",
        "data.dataloader.batch_size=8",
        "data.dataloader.test_batch_size=4",
        "data.dataloader.test_pad_to_multiple=8000",
        "data.pipeline.chunk_length_sec=1.0",
        "trainer=debug_trainer",
        "trainer.max_steps=12",
        "trainer.val_check_interval=6",
        f"trainer.checkpoint_dir={tmp_path / 'ckpt'}",
        "seed=3",
    ] + extra


def test_run_dummy_experiment(corpus, tmp_path):
    import run as run_cli

    objective = run_cli.main(
        _common_overrides(corpus, tmp_path, ["+experiment=speaker_dummy"])
    )
    assert 0.0 <= objective <= 1.0


def test_fit_eval_model_flags(corpus, tmp_path):
    """fit_model/eval_model gate the driver's train and test phases
    independently (reference main.py:496-528 + train_eval.yaml:40-44):
    eval_model=false trains but returns a null objective; fit_model=false +
    load_network_from_checkpoint is the eval-only flow and must reproduce
    the trained weights' test objective without training."""
    import run as run_cli

    net = [
        "network=xvector",
        "network.tdnn_channels=[16,16,32]",
        "network.tdnn_kernel_sizes=[5,3,1]",
        "network.tdnn_dilations=[1,2,1]",
        "network.lin_neurons=16",
        "network.n_mels=16",
        "network.in_channels=16",
        "trainer.max_steps=6",
        "trainer.val_check_interval=3",
    ]
    # train-only: no test phase, null objective, but checkpoints exist
    objective = run_cli.main(
        _common_overrides(corpus, tmp_path, net + ["eval_model=false"])
    )
    assert objective is None
    best = tmp_path / "ckpt" / "last"
    assert best.exists()

    # eval-only on the saved weights: no training (max_steps honored at 0
    # train batches), objective reproduced from the warm-started network
    objective = run_cli.main(
        _common_overrides(
            corpus,
            tmp_path,
            net
            + [
                "fit_model=false",
                f"load_network_from_checkpoint={best}",
                f"trainer.checkpoint_dir={tmp_path / 'ckpt_evalonly'}",
            ],
        )
    )
    assert 0.0 <= objective <= 1.0
    # eval-only must not have trained anything
    assert not (tmp_path / "ckpt_evalonly" / "last").exists()


def test_run_xvector_asnorm_evaluator(corpus, tmp_path):
    """evaluator=cosine_distance_asnorm through the full driver: training
    embeddings + labels feed the cohort fit, val/test EER comes from
    AS-normalized scores (beyond-reference capability)."""
    import run as run_cli

    objective = run_cli.main(
        _common_overrides(
            corpus,
            tmp_path,
            [
                "network=xvector",
                "network.tdnn_channels=[16,16,32]",
                "network.tdnn_kernel_sizes=[5,3,1]",
                "network.tdnn_dilations=[1,2,1]",
                "network.lin_neurons=16",
                "network.n_mels=16",
                "network.in_channels=16",
                "evaluator=cosine_distance_asnorm",
                "evaluator.cohort_topk=4",
                "evaluator.max_num_training_samples=24",
                "trainer.max_steps=6",
                "trainer.val_check_interval=3",
            ],
        )
    )
    assert 0.0 <= objective <= 1.0


def test_checkpoint_averaging_e2e(corpus, tmp_path, capsys):
    """trainer.save_top_k=2 + average_top_k=2: the test phase runs on the
    uniform average of the two best checkpoints (checkpoint averaging)."""
    import json

    import run as run_cli

    objective = run_cli.main(
        _common_overrides(
            corpus,
            tmp_path,
            [
                "+experiment=speaker_dummy",
                "trainer.save_top_k=2",
                "trainer.average_top_k=2",
                "trainer.max_steps=6",
                "trainer.val_check_interval=2",
                "trainer.limit_train_batches=null",
            ],
        )
    )
    assert 0.0 <= objective <= 1.0
    index = json.loads((tmp_path / "ckpt" / "index.json").read_text())
    assert len(index["best"]) == 2
    assert "checkpoint averaging: 2 best" in capsys.readouterr().out


def test_progress_tracker_e2e(corpus, tmp_path):
    """callbacks=speaker_progress_tracker through the driver: every
    validation writes an embedding snapshot under <run_dir>/progress and
    separation metrics ride in the val metrics."""
    import run as run_cli

    objective = run_cli.main(
        _common_overrides(
            corpus,
            tmp_path,
            [
                "+experiment=speaker_dummy",
                "callbacks=speaker_progress_tracker",
                "callbacks.progress_tracker.num_tracked_speakers=3",
                "trainer.max_steps=6",
                "trainer.val_check_interval=3",
            ],
        )
    )
    assert 0.0 <= objective <= 1.0
    progress = tmp_path / "progress"
    snaps = sorted(progress.glob("step_*"))
    assert snaps, "no progress snapshots written"
    assert (snaps[0] / "embeddings.npy").exists()
    assert (snaps[0] / "embeddings.png").exists()
    assert (snaps[0] / "stats.txt").exists()


def test_multirun_train_only_summary(corpus, tmp_path, capsys):
    """A train-only grid (`-m ... eval_model=false`) returns None objectives;
    the multirun summary must report them instead of crashing after all the
    training compute was spent."""
    import run as run_cli

    best = run_cli.main(
        ["-m"]
        + _common_overrides(
            corpus,
            tmp_path,
            [
                "+experiment=speaker_dummy",
                "trainer.max_steps=4",
                "trainer.val_check_interval=4",
                "seed=3,4",
                "eval_model=false",
            ],
        )
    )
    assert best is None
    out = capsys.readouterr().out
    assert "multirun summary" in out


def test_run_xvector_small(corpus, tmp_path):
    import run as run_cli

    objective = run_cli.main(
        _common_overrides(
            corpus,
            tmp_path,
            [
                "network=xvector",
                "network.tdnn_channels=[24,24,48]",
                "network.tdnn_kernel_sizes=[5,3,1]",
                "network.tdnn_dilations=[1,2,1]",
                "network.lin_neurons=24",
                "network.n_mels=24",
                "network.in_channels=24",
                "optim.algo.lr=3e-3",
                "trainer.max_steps=180",
                "trainer.val_check_interval=60",
                "trainer.limit_train_batches=null",
            ],
        )
    )
    # learns synthetic formant speakers: EER quantum on the 6 trial pairs
    # is 1/3, so accept one error (0.33) and reject chance-level (>=0.5).
    # 90 steps passed with round-1's replayed-epoch data loader; per-epoch
    # reshuffling (reference semantics) needs a little longer on this
    # tiny synthetic corpus.
    assert 0.0 <= objective <= 0.4


def test_run_wav2vec2_tiny_aam(corpus, tmp_path):
    import run as run_cli

    objective = run_cli.main(
        _common_overrides(
            corpus,
            tmp_path,
            [
                "+experiment=speaker_wav2vec2_aam",
                "network.wav2vec2_size=tiny",
                "network.layerdrop=0.0",
                "trainer=debug_trainer",
                "trainer.max_steps=8",
                "trainer.val_check_interval=4",
                f"trainer.checkpoint_dir={tmp_path / 'ckpt2'}",
                "trainer.precision=f32",
                "data.dataloader.batch_size=8",
                "data.dataloader.test_batch_size=4",
                "data.dataloader.test_pad_to_multiple=8000",
            ],
        )
    )
    assert 0.0 <= objective <= 1.0


def test_predict_cli(corpus, tmp_path):
    import predict as predict_cli

    wav_dir, trials = corpus
    # pair file with 2-column format over real files
    pair_file = tmp_path / "pairs.txt"
    pair_file.write_text(
        "id00000/yt0/00000.wav id00000/yt0/00001.wav\n"
        "id00000/yt0/00000.wav id00003/yt1/00002.wav\n"
    )
    score_file = predict_cli.main(
        [
            "network=xvector",
            "network.tdnn_channels=[24,24,48]",
            "network.tdnn_kernel_sizes=[5,3,1]",
            "network.tdnn_dilations=[1,2,1]",
            "network.lin_neurons=24",
            "network.n_mels=24",
            "network.in_channels=24",
            "network.explicit_num_speakers=4",
            f"predict_folder_path={wav_dir}",
            f"pair_prediction_path={pair_file}",
            "data.dataloader.test_batch_size=2",
            "data.dataloader.test_pad_to_multiple=8000",
        ]
    )
    lines = score_file.read_text().splitlines()
    assert len(lines) == 2
    for line in lines:
        score, f1, f2 = line.split(" ")
        assert 0.0 <= float(score) <= 1.0
        assert f1.endswith(".wav")


def test_predict_cli_asnorm(corpus, tmp_path):
    """predict.py with evaluator=cosine_distance_asnorm: the extraction set
    itself serves as the impostor cohort (self-matches excluded)."""
    import predict as predict_cli

    wav_dir, trials = corpus
    pair_file = tmp_path / "pairs_asnorm.txt"
    pair_file.write_text(
        "id00000/yt0/00000.wav id00000/yt0/00001.wav\n"
        "id00000/yt0/00000.wav id00003/yt1/00002.wav\n"
        "id00001/yt0/00000.wav id00002/yt1/00001.wav\n"
    )
    score_file = predict_cli.main(
        [
            "network=xvector",
            "network.tdnn_channels=[24,24,48]",
            "network.tdnn_kernel_sizes=[5,3,1]",
            "network.tdnn_dilations=[1,2,1]",
            "network.lin_neurons=24",
            "network.n_mels=24",
            "network.in_channels=24",
            "network.explicit_num_speakers=4",
            f"predict_folder_path={wav_dir}",
            f"pair_prediction_path={pair_file}",
            "evaluator=cosine_distance_asnorm",
            "evaluator.cohort_topk=3",
            "data.dataloader.test_batch_size=2",
            "data.dataloader.test_pad_to_multiple=8000",
        ]
    )
    lines = score_file.read_text().splitlines()
    assert len(lines) == 3
    for line in lines:
        score, f1, f2 = line.split(" ")
        assert 0.0 <= float(score) <= 1.0


def test_voxceleb2_test_hard_protocol_end_to_end(tmp_path):
    """The headline protocol composes from the CLI: train on a synthetic
    vox2-dev corpus, test on all of a synthetic vox1 via a hard trial list
    (data.module=voxceleb2_test_hard, reference voxceleb2_test_hard.yaml)."""
    import run as run_cli
    from tests.test_datamodule import _build_corpus_tree

    vox1_dev = tmp_path / "vox1/wav"
    vox1_test = tmp_path / "vox1_test/wav"
    vox2_dev = tmp_path / "vox2/wav"
    v1_ids = [f"id1{s:04d}" for s in range(3)]
    v1t_ids = [f"id1{s:04d}" for s in range(3, 5)]
    _build_corpus_tree(vox1_dev, v1_ids, seed=1)
    _build_corpus_tree(vox1_test, v1t_ids, seed=2)
    _build_corpus_tree(vox2_dev, [f"id0{s:04d}" for s in range(5)],
                       n_yt=3, n_utt=3, seed=3)
    trial_ids = v1_ids + v1t_ids
    lines = []
    for i, spk in enumerate(trial_ids):
        lines.append(f"1 {spk}/yt0/00000.wav {spk}/yt1/00001.wav")
        other = trial_ids[(i + 1) % len(trial_ids)]
        lines.append(f"0 {spk}/yt0/00000.wav {other}/yt1/00000.wav")
    trial = tmp_path / "list_test_hard2.txt"
    trial.write_text("\n".join(lines) + "\n")

    objective = run_cli.main(
        [
            "+experiment=speaker_dummy",
            "data.module=voxceleb2_test_hard",
            f"data.module.voxceleb1_dev_dir={vox1_dev}",
            f"data.module.voxceleb1_test_dir={vox1_test}",
            f"data.module.voxceleb2_dev_dir={vox2_dev}",
            f"data.module.shards_dir={tmp_path / 'shards'}",
            f"data.module.test_trial_path={trial}",
            "data.module.train_val_ratio=0.7",
            "data.module.eer_validation_pairs=8",
            "data.shards.samples_per_shard=8",
            "data.dataloader.batch_size=8",
            "data.dataloader.test_batch_size=4",
            "data.dataloader.test_pad_to_multiple=8000",
            "data.pipeline.chunk_length_sec=1.0",
            "trainer=debug_trainer",
            "trainer.max_steps=6",
            "trainer.val_check_interval=3",
            f"trainer.checkpoint_dir={tmp_path / 'ckpt'}",
            "seed=3",
        ]
    )
    assert 0.0 <= objective <= 1.0


def test_pairs_module_preset_bundles_shard_settings():
    """data.module=voxceleb1_pairs is a '# @package _global_' preset: it
    must swap the module AND fix the shard knobs the pair recipes need
    (reference voxceleb1_pairs.yaml:33-42)."""
    cfg = load_config(
        CONFIG_DIR, "train_eval", ["data.module=voxceleb1_pairs"]
    )
    m = cfg["data"]["module"]
    assert m["train_val_split_mode"] == "different"
    assert m["num_val_speakers"] == 41
    assert "voxceleb1_shards_pairs" in m["shards_dir"]
    assert cfg["data"]["shards"]["sequential_same_speaker_samples"] == 4
    assert cfg["data"]["shards"]["min_unique_speakers_per_shard"] == 50
    # CLI value overrides still beat the preset
    cfg = load_config(
        CONFIG_DIR, "train_eval",
        ["data.module=voxceleb2_triplets",
         "data.shards.sequential_same_speaker_samples=8"],
    )
    assert cfg["data"]["shards"]["sequential_same_speaker_samples"] == 8


def test_reference_shards_presets_compose():
    """The reference-named shards presets exist with reference-scale values
    (reference config/data/shards/shards_{voxceleb,librispeech}.yaml), and
    the reference's queue_size-in-shards knob wins over the dataloader
    default when set."""
    from w2v2_speaker_tpu.runtime.experiment import _queue_size

    cfg = load_config(
        CONFIG_DIR, "train_eval", ["data.shards=shards_voxceleb"]
    )
    s = cfg["data"]["shards"]
    assert s["samples_per_shard"] == 5000
    assert s["use_gzip_compression"] is True
    assert _queue_size(cfg) == 1024
    # the preset is schema-complete: run-type keys at reference defaults
    # (voxceleb{1,2}.yaml:41-42)
    assert s["sequential_same_speaker_samples"] == 1
    assert s["min_unique_speakers_per_shard"] == 500

    cfg = load_config(
        CONFIG_DIR, "train_eval", ["data.shards=shards_librispeech"]
    )
    s = cfg["data"]["shards"]
    assert s["samples_per_shard"] == 155000
    assert s["use_gzip_compression"] is False
    assert _queue_size(cfg) == 200

    # without the shards knob the dataloader group default applies
    cfg = load_config(CONFIG_DIR, "train_eval", [])
    assert _queue_size(cfg) == cfg["data"]["dataloader"]["queue_size"]


def test_all_pipeline_presets_compose():
    """Every reference pipeline preset name must exist and compose
    (reference config/data/pipeline/*, 8 presets)."""
    for preset in [
        "wav2vec_base_pipeline",
        "wav2vec_short_seq_pipeline",
        "wav2vec_pair_pipeline",
        "wav2vec_full_seq_pipeline",
        "xvector_pipeline",
        "xvector_all_augment_pipeline",
        "xvector_dropout_augment_pipeline",
        "xvector_rirs_augment",
    ]:
        cfg = load_config(
            CONFIG_DIR, "train_eval", [f"data.pipeline={preset}"]
        )
        assert "chunk_strategy" in cfg["data"]["pipeline"], preset
    cfg = load_config(
        CONFIG_DIR, "train_eval",
        ["data.pipeline=wav2vec_full_seq_pipeline"],
    )
    assert cfg["data"]["pipeline"]["chunk_length_sec"] is None


def test_all_augment_pipeline_builds_full_chain():
    """xvector_all_augment_pipeline must build the reference study's five
    augmentations in order with stack/yield semantics
    (xvector_all_augment_pipeline.yaml:22-57)."""
    from w2v2_speaker_tpu.data.augment import (
        ChoiceRandomNoiseAugment,
        ChoiceSpeedAugment,
        FrequencyDropoutAugment,
        ReverbAugment,
        TimeDropoutAugment,
    )
    from w2v2_speaker_tpu.runtime.experiment import build_augmenter

    cfg = load_config(
        CONFIG_DIR, "train_eval",
        ["data.pipeline=xvector_all_augment_pipeline"],
    )
    aug = build_augmenter(cfg["data"]["pipeline"], seed=0)
    assert [type(a) for a in aug.augmenters] == [
        TimeDropoutAugment,
        FrequencyDropoutAugment,
        ChoiceSpeedAugment,
        ReverbAugment,
        ChoiceRandomNoiseAugment,
    ]
    assert aug.stack is False
    assert aug.yield_intermediate is True
    assert aug.yield_unaugmented is True
    # a sample fans out into unaugmented + one per augmentation
    from w2v2_speaker_tpu.data.samples import SpeakerSample

    wav = np.random.default_rng(0).normal(0, 0.1, 16000).astype(np.float32)
    outs = aug(SpeakerSample(key="a/b/c", wav=wav, ground_truth=0))
    assert len(outs) == 6


def test_spec_augment_time_domain_reachable_from_config():
    from w2v2_speaker_tpu.data.augment import SpecAugmentTimeDomain
    from w2v2_speaker_tpu.runtime.experiment import build_augmenter

    aug = build_augmenter(
        {"augment": {"enabled": True,
                     "spec_augment_speeds": [95, 100, 105]}},
        seed=0,
    )
    assert [type(a) for a in aug.augmenters] == [SpecAugmentTimeDomain]


def test_full_seq_chunk_selector_passthrough():
    from w2v2_speaker_tpu.data.chunks import ChunkSelector

    sel = ChunkSelector("none", None)
    wav = np.arange(12345, dtype=np.float32)
    (out,) = sel(wav)
    assert out is wav


def test_xvector_augment_study_composes_and_trains(corpus, tmp_path):
    """The reference's x-vector augmentation-study composition
    (+experiment=speaker_xvector data/pipeline=xvector_all_augment_pipeline)
    runs end-to-end: contiguous chunk fan-out + non-stacked augmenter with
    yield_unaugmented/intermediate semantics feeding real training."""
    import run as run_cli

    objective = run_cli.main(
        _common_overrides(
            corpus, tmp_path,
            [
                "+experiment=speaker_xvector",
                "data.pipeline=xvector_all_augment_pipeline",
                "data.pipeline.chunk_length_sec=1.0",
                "trainer=debug_trainer",
                "trainer.max_steps=4",
                "trainer.val_check_interval=2",
            ],
        )
    )
    assert 0.0 <= objective <= 1.0


def test_large_experiment_preset_composes():
    """speaker_wav2vec2_large_aam encodes the measured LARGE optimum
    (PERF.md round-4 remat-policy table: batch 48 + dots_no_batch =
    217 utt/s > the batch-66 layout's 190) as a reproducible preset."""
    cfg = load_config(
        CONFIG_DIR, "train_eval", ["+experiment=speaker_wav2vec2_large_aam"]
    )
    assert cfg["network"]["wav2vec2_size"] == "large"
    assert cfg["network"]["remat_policy"] == "dots_no_batch"
    assert cfg["trainer"]["remat"] is True
    assert cfg["trainer"]["precision"] == "bf16"
    assert cfg["data"]["dataloader"]["batch_size"] == 48
    assert cfg["optim"]["loss"]["name"] == "aam_softmax"
    assert cfg["optim"]["algo"]["lr"] == pytest.approx(5e-5)

    # the policy actually reaches the backbone config through the builder
    from w2v2_speaker_tpu.runtime.experiment import build_model_and_task

    task, kind = build_model_and_task(cfg, num_speakers=10)
    assert kind == "speaker"
    w2v2 = task.model.cfg.w2v2
    assert w2v2.remat_policy == "dots_no_batch"
    assert w2v2.remat is True
    assert w2v2.num_layers == 24 and w2v2.hidden_size == 1024
