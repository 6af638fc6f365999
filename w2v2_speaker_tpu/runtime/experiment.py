"""Train/eval orchestration — the `run_train_eval_script` equivalent.

Mirrors `/root/reference/src/main.py:95-551`: seed -> data module ->
evaluator -> network/task -> optimizer+schedule -> train with periodic
validation EER/WER + checkpointing -> test on the best checkpoint -> return
the scalar objective for sweepers. The isinstance-dispatch on config
dataclasses (`main.py:236-253`) becomes name-keyed builders over the plain
config dict; DDP setup/teardown (`main.py:500-514`) becomes a device mesh
that the jitted steps shard over.
"""

from __future__ import annotations

import pathlib
from collections import deque
from typing import Deque, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augment import (
    Augmenter,
    ChoiceRandomNoiseAugment,
    ChoiceRirsNoiseAugment,
    ChoiceSpeedAugment,
    FrequencyDropoutAugment,
    ReverbAugment,
    SpecAugmentTimeDomain,
    TimeDropoutAugment,
    UniformSpeedAugment,
)
from ..data.collate import collate_pad_right
from ..data.datamodule import VoxCelebConfig, VoxCelebDataModule
from ..data.features import FbankConfig
from ..data.librispeech import LibriSpeechConfig, LibriSpeechDataModule
from ..data.samples import collate_paired_batch
from ..data.batching import PairedBatchProcessor
from ..eval.backends import LDAEvaluator, PLDAEvaluator
from ..eval.evaluator import (
    ASNormCosineEvaluator,
    CosineDistanceEvaluator,
    EmbeddingSample,
    SpeakerRecognitionEvaluator,
)
from ..models.dummy import DummyModel
from ..models.ecapa import EcapaConfig, EcapaModel
from ..models.frontend import FbankFrontend
from ..models.wav2spk import Wav2SpkConfig, Wav2SpkModel
from ..models.wav2vec2 import BASE_CONFIG, LARGE_CONFIG, Wav2Vec2Config
from ..models.wav2vec2_convert import load_hf_checkpoint
from ..models.wav2vec2_paired import Wav2Vec2PairedConfig, Wav2Vec2PairedModel
from ..models.wav2vec2_speaker import (
    Wav2Vec2SpeakerConfig,
    Wav2Vec2SpeakerModel,
)
from ..models.wav2vec2_speech import (
    Wav2Vec2SpeechConfig,
    Wav2Vec2SpeechModel,
)
from ..models.xvector import XVectorConfig, XVectorModel
from ..objectives import schedules
from ..parallel.mesh import (
    batch_sharding,
    create_mesh,
    pad_batch_rows,
    replicated,
    shard_batch,
    strip_host_fields,
)
from ..train.checkpoint import CheckpointManager, load_params
from ..train.paired_task import PairedSpeakerTask, paired_scores_to_metrics
from ..train.speaker_task import SpeakerTask
from ..train.speech_task import SpeechTask
from ..train.state import TrainState, make_freeze_schedule_tx
from ..train.steps import make_embed_fn, make_logits_fn, make_train_step
from .logging import MetricsLogger

__all__ = ["run_train_eval", "build_model_and_task", "extract_embeddings"]

TINY_W2V2 = Wav2Vec2Config(  # for debug/e2e-test runs
    conv_dim=(32, 32),
    conv_kernel=(10, 3),
    conv_stride=(5, 2),
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    intermediate_size=96,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


# ------------------------------------------------------------------ builders

def build_augmenter(pipeline_cfg: Dict, seed: int) -> Optional[Augmenter]:
    """Full augmentation config surface of the reference's pipeline presets
    (xvector_all_augment_pipeline.yaml:22-57): time dropout, frequency
    dropout, uniform/choice/SpecAugment-time-domain speed perturbation,
    reverb, uniform-noise or RIRS noise — chained in the reference study's
    order — plus the Augmenter's stack/yield-intermediate/yield-unaugmented
    semantics (augment.py:78-142)."""
    aug = pipeline_cfg.get("augment") or {}
    if not aug.get("enabled"):
        return None
    chain = []
    # dict-valued ops gate on presence (null disables): an explicit empty
    # {} means "enabled with defaults", never silently off
    if aug.get("time_dropout") is not None:
        td = aug["time_dropout"]
        chain.append(
            TimeDropoutAugment(
                max_dropout_length_seconds=td.get("max_seconds", 0.25),
                min_drop_count=td.get("min_count", 0),
                max_drop_count=td.get("max_count", 5),
                seed=seed + 2,
            )
        )
    if aug.get("freq_dropout") is not None:
        fd = aug["freq_dropout"]
        chain.append(
            FrequencyDropoutAugment(
                min_drop_count=fd.get("min_count", 0),
                max_drop_count=fd.get("max_count", 5),
                band_scaling=fd.get("band_scaling", 1.0),
                seed=seed + 5,
            )
        )
    if aug.get("speed"):
        chain.append(
            UniformSpeedAugment(
                min_speed_factor=aug["speed"]["min"],
                max_speed_factor=aug["speed"]["max"],
                seed=seed + 1,
            )
        )
    if aug.get("speed_choices"):
        chain.append(
            ChoiceSpeedAugment(
                possible_speed_factors=aug["speed_choices"], seed=seed + 6
            )
        )
    if aug.get("spec_augment_speeds"):
        chain.append(
            SpecAugmentTimeDomain(
                speeds=aug["spec_augment_speeds"], seed=seed + 7
            )
        )
    if aug.get("reverb"):
        rv = aug["reverb"] if isinstance(aug["reverb"], dict) else {}
        chain.append(
            ReverbAugment(
                room_scale_min=rv.get("room_scale_min", 0),
                room_scale_max=rv.get("room_scale_max", 100),
                seed=seed + 4,
            )
        )
    if aug.get("rirs_shards"):
        chain.append(
            ChoiceRirsNoiseAugment(
                aug["rirs_shards"],
                snr_choices=(
                    aug.get("rirs_snr") or aug.get("noise_snr")
                    or [5, 10, 15, 20]
                ),
                seed=seed + 3,
            )
        )
    elif aug.get("noise_snr"):
        chain.append(
            ChoiceRandomNoiseAugment(
                snr_choices=aug["noise_snr"], seed=seed + 3
            )
        )
    if not chain:
        return None
    return Augmenter(
        chain,
        stack_augmentations=aug.get("stack", True),
        yield_intermediate_augmentations=aug.get(
            "yield_intermediate", False
        ),
        yield_unaugmented=aug.get("yield_unaugmented", False),
    )


def _queue_size(cfg: Dict) -> int:
    """Sample-queue size for the batch processors. The reference keeps this
    knob in the shards group (config/data/shards/shards_voxceleb.yaml:16);
    honor it there when set, else the dataloader group default."""
    return (
        cfg["data"]["shards"].get("queue_size")
        or cfg["data"]["dataloader"]["queue_size"]
    )


def build_data_module(cfg: Dict):
    m = cfg["data"]["module"]
    if m["name"] == "voxceleb":
        p = cfg["data"]["pipeline"]
        s = cfg["data"]["shards"]
        dl = cfg["data"]["dataloader"]
        def _opt_path(key):
            return pathlib.Path(m[key]) if m.get(key) else None

        dm = VoxCelebDataModule(
            VoxCelebConfig(
                data_dir=_opt_path("data_dir"),
                shards_dir=pathlib.Path(m["shards_dir"]),
                test_trial_path=_opt_path("test_trial_path"),
                # multi-corpus composition (reference voxceleb2_test_*.yaml)
                voxceleb1_dev_dir=_opt_path("voxceleb1_dev_dir"),
                voxceleb1_test_dir=_opt_path("voxceleb1_test_dir"),
                voxceleb2_dev_dir=_opt_path("voxceleb2_dev_dir"),
                voxceleb2_test_dir=_opt_path("voxceleb2_test_dir"),
                use_voxceleb1_dev=m.get("use_voxceleb1_dev", True),
                use_voxceleb1_test=m.get("use_voxceleb1_test", True),
                use_voxceleb2_dev=m.get("use_voxceleb2_dev", True),
                use_voxceleb2_test=m.get("use_voxceleb2_test", False),
                all_voxceleb1_is_test_set=m.get(
                    "all_voxceleb1_is_test_set", False
                ),
                has_train=m.get("has_train", True),
                has_val=m.get("has_val", True),
                has_test=m.get("has_test", True),
                train_val_split_mode=m["train_val_split_mode"],
                train_val_ratio=m["train_val_ratio"],
                num_val_speakers=m.get("num_val_speakers") or 0,
                eer_validation_pairs=m["eer_validation_pairs"],
                samples_per_shard=s["samples_per_shard"],
                sequential_same_speaker_samples=s[
                    "sequential_same_speaker_samples"
                ],
                min_unique_speakers_per_shard=s[
                    "min_unique_speakers_per_shard"
                ],
                use_gzip_compression=s["use_gzip_compression"],
                shuffle_shards=s["shuffle_shards"],
                queue_size=_queue_size(cfg),
                # the reference README uses data.dataloader.train_batch_size
                batch_size=dl.get("train_batch_size") or dl["batch_size"],
                chunk_length_sec=p["chunk_length_sec"],
                chunk_strategy=p["chunk_strategy"],
                normalize_input=p["normalize_input"],
                augmenter=build_augmenter(p, cfg["seed"]),
                limit_samples=m.get("limit_samples"),
                num_pipeline_workers=dl.get("num_pipeline_workers", 1),
                seed=cfg["seed"],
            )
        )
        dm.prepare_data()
        return dm
    if m["name"] == "librispeech":
        dl = cfg["data"]["dataloader"]
        split_dirs = {}
        for split, key in [
            ("train", "train_dir"),
            ("val_clean", "val_clean_dir"),
            ("val_other", "val_other_dir"),
            ("test_clean", "test_clean_dir"),
            ("test_other", "test_other_dir"),
        ]:
            if m.get(key) and pathlib.Path(m[key]).exists():
                split_dirs[split] = pathlib.Path(m[key])
        dm = LibriSpeechDataModule(
            LibriSpeechConfig(
                split_dirs=split_dirs,
                shards_dir=pathlib.Path(m["shards_dir"]),
                train_max_num_samples=dl["train_max_num_samples"],
                max_batch_size=dl.get("max_batch_size"),
                max_queue_size=_queue_size(cfg),
                pad_to_multiple=dl["pad_to_multiple"],
                tokenizer_name=(cfg.get("tokenizer") or {}).get(
                    "name", "corpus_char"
                ),
                # the multitask recipe always needs per-utterance speaker
                # indices; plain speech runs can opt in from YAML
                with_speaker_labels=bool(m.get("with_speaker_labels"))
                or cfg["network"]["name"] == "wav2vec2_multitask",
                seed=cfg["seed"],
            )
        )
        dm.prepare_data()
        return dm
    raise ValueError(f"unknown data module {m['name']}")


def build_evaluator(cfg: Dict) -> SpeakerRecognitionEvaluator:
    e = cfg["evaluator"]
    if e["name"] == "cosine_distance":
        return CosineDistanceEvaluator(
            center_before_scoring=e["center_before_scoring"],
            length_norm_before_scoring=e["length_norm_before_scoring"],
            max_num_training_samples=e["max_num_training_samples"],
        )
    if e["name"] == "cosine_distance_asnorm":
        return ASNormCosineEvaluator(
            cohort_topk=int(e.get("cohort_topk", 300)),
            center_before_scoring=e.get("center_before_scoring", False),
            length_norm_before_scoring=e.get(
                "length_norm_before_scoring", True
            ),
            max_num_training_samples=e["max_num_training_samples"],
        )
    if e["name"] == "lda":
        return LDAEvaluator(
            num_pca_components=e["num_pca_components"],
            max_num_training_samples=e["max_num_training_samples"],
        )
    if e["name"] == "plda":
        return PLDAEvaluator(
            num_pca_components=e["num_pca_components"],
            num_em_iterations=e["num_em_iterations"],
            max_num_training_samples=e["max_num_training_samples"],
        )
    raise ValueError(f"unknown evaluator {e['name']}")


def _w2v2_config(
    net: Dict, precision: str, remat: bool, accumulate: int = 1
) -> Wav2Vec2Config:
    size = net.get("wav2vec2_size", "base")
    base = {"base": BASE_CONFIG, "large": LARGE_CONFIG, "tiny": TINY_W2V2}[
        size
    ]
    return Wav2Vec2Config(
        **{
            **base.__dict__,
            # native grouped pos-conv (faster bwd) is only grad-safe when
            # each program computes the gradient once — see the config
            # field's note on the XLA SPMD grouped-conv bug. YAML/CLI can
            # override the automatic choice (e.g. force the decomposed
            # path under other SPMD multi-grad patterns).
            "posconv_decomposed": net.get("posconv_decomposed", accumulate > 1),
            "activation_dropout": net["activation_dropout"],
            "attention_dropout": net["attention_dropout"],
            "feat_proj_dropout": net["feat_proj_dropout"],
            "hidden_dropout": net["hidden_dropout"],
            "layerdrop": net["layerdrop"],
            "mask_feature_length": net["mask_feature_length"],
            "mask_feature_prob": net["mask_feature_prob"],
            "mask_time_length": net["mask_time_length"],
            "mask_time_prob": net["mask_time_prob"],
            "dtype": "bfloat16" if precision == "bf16" else "float32",
            "remat": remat,
            # remat policy: "dots" saves matmul outputs and recomputes only
            # the elementwise chain in the backward; "nothing" is
            # minimum-memory full recompute (see the config field's note)
            "remat_policy": net.get("remat_policy", "nothing"),
            "attention_impl": net.get("attention_impl", "xla"),
            # "fused_pallas" routes eligible feature-encoder layers through
            # ops/conv_encoder.py; "xla" is the measured optimum on v5e
            # (PERF.md conv-encoder roofline)
            "conv_impl": net.get("conv_impl", "xla"),
            "encoder_unroll": net.get("encoder_unroll", 1),
            # inference-only int8 MXU matmuls (ops/quant.py) — the
            # train driver rejects it (no gradient path); predict.py and
            # the serving entry use it for ~2x dense throughput.
            # "auto" is a serving-dispatch policy (predict.py picks
            # bf16-vs-int8 per duration bucket); the model built here is
            # full precision — only true (or YAML 1) flips the matmuls
            "int8_matmuls": _canon_int8(net.get("int8_matmuls", False))
            is True,
            # counter-hash dropout masks (default): fused iota-hash keep
            # masks instead of standalone rbg PRNG passes — −8.7% on the
            # BASE train step (PERF.md round-4 dropout-sampler table);
            # false restores jax.random.bernoulli streams
            "hash_dropout": net.get("hash_dropout", True),
        }
    )


def build_model_and_task(cfg: Dict, num_speakers: int, tokenizer=None):
    """Returns (task, task_kind) with task_kind in
    {'speaker', 'paired', 'speech', 'multitask'}."""
    net = cfg["network"]
    loss_name = cfg["optim"]["loss"]["name"]
    precision = cfg["trainer"]["precision"]
    remat = cfg["trainer"].get("remat", False)
    acc = int(cfg["trainer"].get("accumulate_grad_batches") or 1)
    n_out = net.get("explicit_num_speakers") or num_speakers

    mode_map = {
        "cross_entropy": "ce",
        "aam_softmax": "aam",
        "triplet": "triplet",
        "triplet_ce": "triplet_ce",
        "ctc": "speaker_ctc",
    }

    name = net["name"]
    if name == "xvector":
        if loss_name == "aam_softmax":
            raise ValueError("xvector does not support aam softmax")
        inner = XVectorModel(
            cfg=XVectorConfig(
                in_channels=net["in_channels"],
                tdnn_channels=tuple(net["tdnn_channels"]),
                tdnn_kernel_sizes=tuple(net["tdnn_kernel_sizes"]),
                tdnn_dilations=tuple(net["tdnn_dilations"]),
                lin_neurons=net["lin_neurons"],
            ),
            num_speakers=n_out,
        )
        model = FbankFrontend(
            inner, fbank=FbankConfig(n_mels=net["n_mels"])
        )
        return SpeakerTask(model=model, mode=mode_map[loss_name]), "speaker"

    if name == "ecapa_tdnn":
        inner = EcapaModel(
            cfg=EcapaConfig(
                in_channels=net["in_channels"],
                channels=tuple(net["channels"]),
                kernel_sizes=tuple(net["kernel_sizes"]),
                dilations=tuple(net["dilations"]),
                attention_channels=net["attention_channels"],
                res2net_scale=net["res2net_scale"],
                se_channels=net["se_channels"],
                global_context=net["global_context"],
                lin_neurons=net["lin_neurons"],
            ),
            num_speakers=n_out,
            use_aam=loss_name == "aam_softmax",
            aam_margin=cfg["optim"]["loss"].get("margin", 0.2),
            aam_scale=cfg["optim"]["loss"].get("scale", 30.0),
        )
        model = FbankFrontend(
            inner, fbank=FbankConfig(n_mels=net["n_mels"])
        )
        return SpeakerTask(model=model, mode=mode_map[loss_name]), "speaker"

    if name == "wav2vec2_fc":
        w2v2 = _w2v2_config(net, precision, remat, acc)
        model = Wav2Vec2SpeakerModel(
            cfg=Wav2Vec2SpeakerConfig(
                w2v2=w2v2,
                feature_encoder_only=net.get(
                    "wav2vec_feature_encoder_only", False
                ),
                stat_pooling_type=net["stat_pooling_type"],
                test_stat_pooling_type=net.get("test_stat_pooling_type"),
                hidden_fc_layers_out=tuple(net["hidden_fc_layers_out"]),
                embedding_layer_idx=net["embedding_layer_idx"],
                use_aam=loss_name == "aam_softmax",
                aam_margin=cfg["optim"]["loss"].get("margin", 0.2),
                aam_scale=cfg["optim"]["loss"].get("scale", 30.0),
                final_channel_mask_prob=net["final_channel_mask_prob"],
                final_channel_mask_width=net["final_channel_mask_width"],
                ctc_head=loss_name == "ctc",
                ctc_blank_bias=100.0 if loss_name == "ctc" else 0.0,
            ),
            num_speakers=n_out,
        )
        mode = mode_map[loss_name]
        if loss_name == "cross_entropy" and net["stat_pooling_type"] == "none":
            mode = "ce_no_pool"
        return SpeakerTask(model=model, mode=mode), "speaker"

    if name == "wav2spk":
        if loss_name == "aam_softmax":
            raise ValueError("wav2spk does not support aam softmax")
        model = Wav2SpkModel(
            cfg=Wav2SpkConfig(
                apply_temporal_gating=net["apply_temporal_gating"],
                hidden_fc_layers_out=tuple(net["hidden_fc_layers_out"]),
                embedding_layer_idx=net["embedding_layer_idx"],
                stat_pooling_type=net["stat_pooling_type"],
            ),
            num_speakers=n_out,
        )
        return SpeakerTask(model=model, mode=mode_map[loss_name]), "speaker"

    if name == "dummy":
        model = DummyModel(num_speakers=n_out)
        return SpeakerTask(model=model, mode=mode_map[loss_name]), "speaker"

    if name == "wav2vec_fc":  # wav2vec v1 (fairseq architecture)
        from ..models.wav2vec1 import Wav2Vec1Config, Wav2Vec1FCModel

        model = Wav2Vec1FCModel(
            cfg=Wav2Vec1Config(
                use_aggregator=net.get("use_aggregation_layers", False),
                dtype="bfloat16" if precision == "bf16" else "float32",
            ),
            stat_pooling_type=net["stat_pooling_type"],
            hidden_fc_layers_out=tuple(net["hidden_fc_layers_out"]),
            embedding_layer_idx=net["embedding_layer_idx"],
            num_speakers=n_out,
        )
        return SpeakerTask(model=model, mode=mode_map[loss_name]), "speaker"

    if name == "wav2vec_xvector":  # wav2vec v1 + x-vector head
        from ..models.wav2vec1 import Wav2Vec1Config, Wav2Vec1XVectorModel

        model = Wav2Vec1XVectorModel(
            cfg=Wav2Vec1Config(
                use_aggregator=net.get("use_aggregation_layers", False),
                dtype="bfloat16" if precision == "bf16" else "float32",
            ),
            xvector=XVectorConfig(
                in_channels=512,
                tdnn_channels=tuple(net["tdnn_channels"]),
                tdnn_kernel_sizes=tuple(net["tdnn_kernel_sizes"]),
                tdnn_dilations=tuple(net["tdnn_dilations"]),
                lin_neurons=net["lin_neurons"],
            ),
            num_speakers=n_out,
        )
        return SpeakerTask(model=model, mode=mode_map[loss_name]), "speaker"

    if name == "wav2vec2_paired":
        w2v2 = _w2v2_config(net, precision, remat, acc)
        model = Wav2Vec2PairedModel(
            cfg=Wav2Vec2PairedConfig(
                w2v2=w2v2,
                cls_token_constant=net["cls_token_constant"],
                sep_token_constant=net["sep_token_constant"],
            )
        )
        return PairedSpeakerTask(model=model), "paired"

    if name == "wav2vec2_multitask":
        # the reference declares this family but raises "No multi-task
        # networks yet!" (main.py:304-307); here it is a working recipe
        if tokenizer is None and not net.get("explicit_vocab_size"):
            raise ValueError(
                "multitask network requires a tokenizer (or "
                "network.explicit_vocab_size for tokenizer-free embedding "
                "extraction, e.g. predict.py)"
            )
        if loss_name not in ("ctc_ce", "ctc_aam"):
            raise ValueError(
                "multitask network requires optim/loss=ctc_ce or ctc_aam"
            )
        from ..models.wav2vec2_multitask import (
            Wav2Vec2MultitaskConfig,
            Wav2Vec2MultitaskModel,
        )
        from ..train.multitask_task import MultitaskTask

        w2v2 = _w2v2_config(net, precision, remat, acc)
        use_aam = loss_name == "ctc_aam"
        model = Wav2Vec2MultitaskModel(
            cfg=Wav2Vec2MultitaskConfig(
                w2v2=w2v2,
                vocab_size=(
                    tokenizer.vocab_size
                    if tokenizer is not None
                    else int(net["explicit_vocab_size"])
                ),
                head_dropout=net["head_dropout"],
                stat_pooling_type=net["stat_pooling_type"],
                hidden_fc_layers_out=tuple(net["hidden_fc_layers_out"]),
                embedding_layer_idx=net["embedding_layer_idx"],
                use_aam=use_aam,
                aam_margin=cfg["optim"]["loss"].get("margin", 0.2),
                aam_scale=cfg["optim"]["loss"].get("scale", 30.0),
            ),
            num_speakers=n_out,
        )
        return (
            MultitaskTask(
                model=model,
                tokenizer=tokenizer,
                mode="aam" if use_aam else "ce",
                speech_weight=cfg["optim"]["loss"].get("speech_weight", 1.0),
                speaker_weight=cfg["optim"]["loss"].get(
                    "speaker_weight", 1.0
                ),
            ),
            "multitask",
        )

    if name == "wav2vec2_fc_letter":
        if tokenizer is None:
            raise ValueError("speech network requires a tokenizer")
        w2v2 = _w2v2_config(net, precision, remat, acc)
        model = Wav2Vec2SpeechModel(
            cfg=Wav2Vec2SpeechConfig(
                w2v2=w2v2,
                vocab_size=tokenizer.vocab_size,
                head_dropout=net["head_dropout"],
                timestep_mask_prob=net["timestep_mask_prob"],
                timestep_mask_width=net["timestep_mask_width"],
                channel_mask_prob=net["channel_mask_prob"],
                channel_mask_width=net["channel_mask_width"],
            )
        )
        return SpeechTask(model=model, tokenizer=tokenizer), "speech"

    raise ValueError(f"unknown network {name}")


def _normalize_schedule_cfg(sched_cfg: Dict) -> Dict:
    """Fold the reference's torch-shaped override paths onto the flat keys.

    The reference README drives tri_stage/exp_decay through the wrapped
    torch LambdaLR object (`optim.schedule.scheduler.lr_lambda.initial_lr=
    1e-7`, README.md:402-420); here schedules are plain functions with flat
    config keys, so those nested CLI paths are aliased in (nested wins —
    it is the explicit CLI override)."""
    nested = sched_cfg.get("scheduler")
    if not isinstance(nested, dict):
        return sched_cfg
    out = dict(sched_cfg)
    for src in (nested, nested.get("lr_lambda")):
        if isinstance(src, dict):
            for k, v in src.items():
                if not isinstance(v, dict):
                    out[k] = v
    return out


def build_optimizer(cfg: Dict) -> optax.GradientTransformation:
    algo = cfg["optim"]["algo"]
    sched_cfg = _normalize_schedule_cfg(cfg["optim"]["schedule"])
    max_steps = cfg["trainer"]["max_steps"]
    lr = algo["lr"]

    name = sched_cfg["name"]
    if name == "one_cycle":
        sched = schedules.one_cycle(
            max_lr=lr,
            total_steps=max_steps,
            pct_start=sched_cfg["pct_start"],
            div_factor=sched_cfg["div_factor"],
            final_div_factor=sched_cfg["final_div_factor"],
        )
    elif name == "tri_stage":
        sched = schedules.tri_stage(
            max_steps,
            sched_cfg["warmup_stage_ratio"],
            sched_cfg["constant_stage_ratio"],
            sched_cfg["decay_stage_ratio"],
            sched_cfg["initial_lr"],
            lr,
            sched_cfg["final_lr"],
        )
    elif name == "constant":
        sched = schedules.constant(lr)
    elif name == "exp_decay":
        sched = schedules.exp_decay(max_steps, lr, sched_cfg["final_lr"])
    elif name == "cyclic":
        # absolute base_lr/max_lr (the reference's CyclicLR surface,
        # config/optim/schedule/schedule_wav2vec_fan_etal.yaml:9-21) with
        # the relative max_lr_factor form kept for the generic preset
        base = sched_cfg.get("base_lr", lr)
        max_lr = sched_cfg.get("max_lr") or base * sched_cfg["max_lr_factor"]
        sched = schedules.cyclic(
            base,
            max_lr,
            sched_cfg["step_size_up"],
            sched_cfg.get("step_size_down"),
        )
    elif name == "multi_step":
        sched = schedules.multi_step_decay(
            lr, sched_cfg["milestones"], sched_cfg["gamma"]
        )
    elif name == "reduce_on_plateau":
        # base lr is constant; the train loop multiplies in the
        # ReduceLROnPlateauController factor after each validation via
        # optax.inject_hyperparams
        sched = lr
    else:
        raise ValueError(f"unknown schedule {name}")

    plateau = name == "reduce_on_plateau"

    # inject_hyperparams passes hyperparameters by keyword: the factory's
    # parameter must be named `learning_rate`
    if algo["name"] == "adam":
        # optim.algo.mu_dtype=bfloat16: store adam's first moment in bf16 —
        # halves mu's HBM (1.29 GB -> 643 MB on LARGE's 321.6M params) and
        # its read/write traffic in the update. Opt-in: the default keeps
        # f32 moments (exact reference-trajectory numerics).
        mu_dtype = algo.get("mu_dtype") or None
        if algo.get("weight_decay"):

            def make(learning_rate):
                return optax.adamw(
                    learning_rate, b1=algo["b1"], b2=algo["b2"],
                    weight_decay=algo["weight_decay"], mu_dtype=mu_dtype,
                )

        else:

            def make(learning_rate):
                return optax.adam(
                    learning_rate, b1=algo["b1"], b2=algo["b2"],
                    mu_dtype=mu_dtype,
                )

    elif algo["name"] == "sgd":

        def make(learning_rate):
            sgd = optax.sgd(learning_rate, momentum=algo["momentum"])
            if algo.get("weight_decay"):
                # torch-SGD semantics: decay added to the grad before the
                # momentum update
                return optax.chain(
                    optax.add_decayed_weights(algo["weight_decay"]), sgd
                )
            return sgd

    else:
        raise ValueError(f"unknown optimizer {algo['name']}")
    if plateau:
        tx = optax.inject_hyperparams(make)(learning_rate=sched)
    else:
        tx = make(sched)

    # trainer.gradient_clip_val (reference config/trainer/trainer.yaml:64-67,
    # PL Trainer(gradient_clip_val=...)): clip the GLOBAL grad norm before
    # the optimizer sees the gradients; 0/null means no clipping
    clip_val = float(cfg["trainer"].get("gradient_clip_val") or 0)
    if clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_val), tx)

    net = cfg["network"]
    if net.get("wav2vec_initially_frozen"):
        tx = make_freeze_schedule_tx(
            tx,
            frozen_predicate=lambda p: p.startswith("wav2vec2")
            or p.startswith("feature_encoder")
            or p.startswith("feature_projection")
            or p.startswith("encoder"),
            num_frozen_steps=net.get("num_frozen_steps"),
        )
    if net.get("completely_freeze_feature_extractor"):
        tx = make_freeze_schedule_tx(
            tx,
            frozen_predicate=lambda p: "feature_encoder" in p,
            num_frozen_steps=None,
        )
    return tx


# --------------------------------------------------------------- embeddings

def extract_embeddings(
    embed_fn,
    state,
    samples,
    pad_to_multiple: int = 16000,
    batch_size: int = 8,
    num_devices: int = 1,
    ensemble: bool = False,
) -> List[EmbeddingSample]:
    """Batched, bucketed, masked full-utterance embedding extraction —
    replaces the reference's bs=1 loop (speaker_recognition_module.py:468).
    The batch dimension pads up to a multiple of the mesh's data-axis size so
    the sharded embed step always sees divisible shapes."""
    batch_size = -(-batch_size // num_devices) * num_devices
    out: List[EmbeddingSample] = []
    samples = sorted(samples, key=lambda s: s.wav.shape[-1])
    for i in range(0, len(samples), batch_size):
        chunk = samples[i : i + batch_size]
        batch = collate_pad_right(
            [s.wav for s in chunk],
            pad_to_multiple=pad_to_multiple,
            dtype=np.float32,
        )
        padded = pad_batch_rows(
            {"features": batch.values, "mask": batch.mask}, batch_size
        )
        values, mask = padded["features"], padded["mask"]
        result = embed_fn(state, jnp.asarray(values), jnp.asarray(mask))
        if ensemble:
            layers = [np.asarray(e)[: len(chunk)] for e in result]
            out.extend(
                EmbeddingSample(s.key, [lay[j] for lay in layers])
                for j, s in enumerate(chunk)
            )
        else:
            embs = np.asarray(result)[: len(chunk)]
            out.extend(
                EmbeddingSample(s.key, embs[j]) for j, s in enumerate(chunk)
            )
    return out


# ------------------------------------------------------------------- driver

def _canon_int8(val):
    """Normalize `network.int8_matmuls`: YAML `1`/`0` arrive as ints
    (yaml.safe_load), and int 1 `==` True but `is not` True — canonicalize
    so 1 means true everywhere (incl. the training guard) instead of
    silently reading as false in the builder."""
    if isinstance(val, str):
        return val
    return bool(val)


def _validate_int8_config(cfg: Dict) -> None:
    """int8 matmuls have no gradient path (round() is zero-gradient) —
    training would silently never update the dense layers. Inference-only
    flows are fine: predict.py, and the eval-only driver path
    (fit_model=false + warm start)."""
    val = _canon_int8(cfg["network"].get("int8_matmuls", False))
    if val not in (True, False, "auto"):
        raise ValueError(
            f"network.int8_matmuls must be true/false/auto, got {val!r}"
        )
    if val is True and cfg.get("fit_model", True):
        raise ValueError(
            "network.int8_matmuls is inference-only; training recipes "
            "must keep bf16/f32 matmuls (use fit_model=false for an "
            "int8 eval-only run, or predict.py for extraction; "
            "int8_matmuls=auto trains full-precision and only predict.py "
            "dispatches int8 per bucket)"
        )


def _apply_fast_dev_run(cfg: Dict) -> None:
    """trainer.fast_dev_run (reference config/trainer/trainer.yaml:50-52, PL
    Trainer(fast_dev_run=...)): true → 1, an int → n; caps all three
    limit_*_batches to n, runs n steps + one validation, skips the sanity
    validation, and disables checkpointing/resume (PL semantics). A smoke
    run through every phase before committing to a real spend."""
    fdr = cfg["trainer"].get("fast_dev_run")
    if not fdr:
        return
    n = 1 if fdr is True else int(fdr)
    t = cfg["trainer"]
    t["max_steps"] = n
    t["val_check_interval"] = n
    t["limit_train_batches"] = n
    t["limit_val_batches"] = n
    t["limit_test_batches"] = n
    t["num_sanity_val_steps"] = 0
    t["resume"] = False
    print(
        f"fast_dev_run: {n} train/val/test batch(es), "
        "checkpointing disabled"
    )


def run_train_eval(cfg: Dict) -> Optional[float]:
    """Driver (reference main.py:418-551). `fit_model`/`eval_model` gate the
    train and test phases independently: fit_model=false + eval_model=true +
    load_network_from_checkpoint=... is the reference's eval-only flow, and
    eval_model=false returns None (main.py:516-528,550-551)."""
    seed = int(cfg["seed"])
    np.random.seed(seed)

    _validate_int8_config(cfg)
    _apply_fast_dev_run(cfg)

    # trainer.deterministic (reference trainer.yaml:36-37, PL
    # Trainer(deterministic=True) — which buys cudnn/cuda determinism at a
    # noted ~20x slowdown). Validated no-op here: XLA:TPU (and XLA:CPU)
    # compile deterministic programs by default — same program + same
    # inputs + same seeds reproduce bitwise, with no speed trade to make
    # (tests/test_determinism.py pins this). The knob is accepted for
    # recipe compatibility and rejected when it isn't a bool, so a typo'd
    # override fails loudly instead of silently "enabling" nothing.
    det = cfg["trainer"].get("deterministic", False)
    if not isinstance(det, bool):
        raise ValueError(
            f"trainer.deterministic must be a bool, got {det!r}"
        )
    if det:
        print(
            "trainer.deterministic=true: no-op on XLA backends — "
            "execution is already deterministic for fixed seeds"
        )

    # TPU-optimized PRNG for dropout/layerdrop mask generation: threefry is
    # VPU-expensive; rbg measured 13% faster end-to-end train steps on v5e.
    # Applied only on TPU so CPU test behavior is untouched. (A checkpoint's
    # rng key shape depends on the impl — don't flip it mid-resume.)
    if (
        jax.default_backend() == "tpu"
        and cfg["trainer"].get("prng_impl", "rbg") == "rbg"
    ):
        jax.config.update("jax_default_prng_impl", "rbg")

    if cfg.get("use_cometml"):
        # the reference builds a CometLogger from env keys
        # (main.py:371-380); comet isn't installed here, and silently
        # ignoring the flag would fake remote tracking
        try:
            import comet_ml  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "use_cometml=true but the comet_ml package is not available"
                " in this environment; install it or use the TensorBoard"
                " path (trainer.log_dir=...)"
            ) from e

    logger = MetricsLogger(
        log_dir=cfg["trainer"].get("log_dir"),
        flush_every=cfg["trainer"].get("log_every", 100),
    )
    print(f"experiment: {cfg.get('experiment_name')}")

    dm = build_data_module(cfg)
    if hasattr(dm, "summary"):
        print(dm.summary())

    if cfg["trainer"].get("dump_first_batch") and hasattr(
        getattr(dm, "cfg", None), "debug_capture"
    ):
        # per-preprocessor intermediates for the first few pipeline samples
        # (both the VoxCeleb and LibriSpeech pipelines expose the hook),
        # beside the collated first-batch dump (reference input monitor's
        # side_info debug writers, input_monitor_callback.py:93-156).
        # Depth and destination are configurable like the reference's
        # callback config (config/callbacks/debugging.yaml).
        from .debug import PipelineDebugCapture

        mon = (cfg.get("callbacks") or {}).get("input_monitor") or {}
        dm.cfg.debug_capture = PipelineDebugCapture(
            pathlib.Path(
                mon.get("out_dir")
                or pathlib.Path(cfg["trainer"]["checkpoint_dir"]).parent
                / "first_batch"
                / "per_sample"
            ),
            # None-check, not `or`: max_samples=0 is a valid "collated
            # dump only, no per-sample capture" setting
            max_samples=int(
                4
                if mon.get("max_samples") is None
                else mon.get("max_samples")
            ),
        )

    task_kind_tokenizer = (
        dm.tokenizer if isinstance(dm, LibriSpeechDataModule) else None
    )
    num_speakers = (
        dm.num_speakers
        if isinstance(dm, VoxCelebDataModule)
        or cfg["network"]["name"] == "wav2vec2_multitask"
        else 0
    )
    task, kind = build_model_and_task(
        cfg, num_speakers, tokenizer=task_kind_tokenizer
    )

    devices = jax.devices()
    nd = cfg["trainer"].get("num_devices", "all")
    if nd != "all":
        devices = devices[: int(nd)]
    mesh = create_mesh(devices)

    if cfg.get("run_lr_range_test") or cfg.get("tune_model"):
        # the reference's tune path (main.py:458-493): sweep, dump
        # artifacts, return the suggestion instead of training
        from .lr_find import lr_range_test

        example = strip_host_fields(next(iter(dm.train_batches())))
        params, model_state = jax.jit(task.init)(
            jax.random.PRNGKey(cfg["seed"]), example
        )
        out_dir = (
            pathlib.Path(cfg["trainer"]["checkpoint_dir"]).parent
            / "auto_lr_find"
        )
        result = lr_range_test(
            task, params, model_state, dm.train_batches(), mesh,
            num_steps=int(cfg.get("tune_iterations") or 100),
            output_dir=out_dir,
        )
        print(f"lr suggestion: {result['suggestion']}")
        logger.close()
        return result["suggestion"]

    if kind == "speaker":
        return _run_speaker(cfg, dm, task, mesh, logger)
    if kind == "paired":
        return _run_paired(cfg, dm, task, mesh, logger)
    if kind == "speech":
        return _run_speech(cfg, dm, task, mesh, logger)
    if kind == "multitask":
        return _run_multitask(cfg, dm, task, mesh, logger)
    raise ValueError(kind)


def _init_state(cfg, task, example_batch) -> TrainState:
    # jitted init: un-jitted flax init dispatches hundreds of tiny ops,
    # pathological through the remote-TPU transport (CLAUDE.md trap #3)
    params, model_state = jax.jit(task.init)(
        jax.random.PRNGKey(cfg["seed"]), example_batch
    )
    net = cfg["network"]
    if net.get("pretrained_checkpoint"):
        # graft ported wav2vec2 weights into the matching subtree
        w2v2_cfg = _w2v2_config(
            net, cfg["trainer"]["precision"], cfg["trainer"].get("remat", False)
        )
        ported = load_hf_checkpoint(net["pretrained_checkpoint"], w2v2_cfg)
        if "wav2vec2" in params:
            params = dict(params)
            params["wav2vec2"] = jax.tree.map(
                lambda a, b: jnp.asarray(b, a.dtype)
                if a.shape == np.shape(b)
                else a,
                params["wav2vec2"],
                ported,
            )
    if cfg.get("load_network_from_checkpoint"):
        params = load_params(cfg["load_network_from_checkpoint"], params)
    if cfg.get("verify_model"):
        from .debug import batch_gradient_verification, model_summary

        print(model_summary(params))
        if hasattr(task, "embed_fn"):
            bs = example_batch["features"].shape[0]
            if bs >= 2:
                batch_gradient_verification(
                    lambda f, m: task.embed_fn(params, model_state, f, m),
                    np.asarray(example_batch["features"]),
                    example_batch.get("mask"),
                )
                print("batch gradient verification: no cross-batch leakage")
    tx = build_optimizer(cfg)
    return TrainState.create(
        apply_fn=task.model.apply,
        params=params,
        tx=tx,
        model_state=model_state,
        rng=jax.random.PRNGKey(cfg["seed"] + 1),
    )


def _scale_injected_lr(state: TrainState, new_lr: float) -> TrainState:
    """Functionally rebuild the opt state with a new learning rate inside
    the optax.inject_hyperparams state (reduce-on-plateau support).

    Uses optax.tree_utils.tree_set, which walks the whole opt-state pytree —
    so the injected state is found at any nesting depth (e.g. inside the
    freeze-schedule wrapper). Never mutates in place: InjectHyperparamsState
    is a NamedTuple and in-place edits of its fields silently don't stick.
    """
    import optax.tree_utils as otu

    new_opt_state = otu.tree_set(
        state.opt_state, learning_rate=jnp.asarray(new_lr, jnp.float32)
    )
    return state.replace(opt_state=new_opt_state)


class EarlyStopping:
    """Stop training when the monitored metric stops improving or diverges
    (reference config/callbacks/speaker_early_stopping.yaml: PL EarlyStopping
    on val_eer, min_delta 0, patience 4, mode min, check_finite,
    divergence_threshold). Returns a human-readable stop reason or None."""

    def __init__(self, monitor="val_eer", min_delta=0.0, patience=4,
                 mode="min", check_finite=True, divergence_threshold=None):
        self.monitor = monitor
        self.min_delta = abs(float(min_delta))
        self.patience = int(patience)
        self.sign = -1.0 if mode == "min" else 1.0
        self.check_finite = bool(check_finite)
        self.divergence_threshold = divergence_threshold
        self.best = None
        self.wait = 0

    def update(self, val_metrics: Dict) -> Optional[str]:
        if self.monitor not in val_metrics:
            return None
        value = float(val_metrics[self.monitor])
        if self.check_finite and not np.isfinite(value):
            return f"{self.monitor} is not finite ({value})"
        if self.divergence_threshold is not None and (
            self.sign * value < self.sign * float(self.divergence_threshold)
        ):
            return (
                f"{self.monitor}={value:.4f} diverged past "
                f"{self.divergence_threshold}"
            )
        if self.best is None or (
            self.sign * value > self.sign * self.best + self.min_delta
        ):
            self.best = value
            self.wait = 0
            return None
        self.wait += 1
        # PL semantics: stop once wait_count REACHES patience (>=), i.e.
        # after `patience` consecutive non-improving validations
        if self.wait >= self.patience:
            return (
                f"{self.monitor} did not improve for {self.wait} "
                f"validations (best {self.best:.4f})"
            )
        return None


def _train_loop(cfg, task, state, mesh, logger, train_iter_fn, validate_fn,
                loss_fn_kind="speaker", on_step=None):
    if not cfg.get("fit_model", True):
        # reference main.py:496-497 + 525-528: fit_model=false skips
        # training AND the best-checkpoint restore — evaluation (if any)
        # runs on the module's current weights, e.g. warm-started via
        # load_network_from_checkpoint
        return state, None
    trainer = cfg["trainer"]
    max_steps = trainer["max_steps"]
    val_every = trainer.get("val_check_interval") or max_steps
    limit_train = trainer.get("limit_train_batches")
    acc = trainer.get("accumulate_grad_batches", 1)
    min_steps = int(trainer.get("min_steps") or 0)
    # trainer.{min,max}_epochs (reference trainer.yaml:14-18, PL
    # Trainer(min_epochs=..., max_epochs=...)): the epoch-denominated twins
    # of min_steps/max_steps. An "epoch" is one exhaustion of the train
    # iterator (or one limit_train_batches window when that cap is set).
    max_epochs = trainer.get("max_epochs")
    max_epochs = float("inf") if max_epochs is None else int(max_epochs)
    min_epochs = int(trainer.get("min_epochs") or 0)
    fast_dev = bool(trainer.get("fast_dev_run"))

    # one pjit step builder for all five task families (speaker/paired/
    # speech share the loss_fn(params, model_state, batch, rng, train)
    # contract): explicit shardings + on-device grad accumulation everywhere,
    # matching the reference's module-agnostic accumulate_grad_batches
    # (trainer.yaml:33)
    step_fn = make_train_step(
        task, mesh, accumulate_steps=acc,
        return_embeddings=on_step is not None,
    )

    ckpt = CheckpointManager(
        trainer["checkpoint_dir"],
        monitor="val_eer" if loss_fn_kind != "speech" else "val_wer",
        top_k=int(trainer.get("save_top_k", 1)),
    )
    resumed_epoch = 0
    if trainer.get("resume"):
        try:
            state = ckpt.restore(state, name="last")
            # continue epoch accounting too (PL persists the epoch
            # counter): without this, max_epochs/min_epochs restart from
            # 0 on every relaunch
            resumed_epoch = ckpt.last_epoch() or 0
            print(
                f"resumed from step {int(state.step)}"
                f" (epoch {resumed_epoch})"
            )
        except FileNotFoundError:
            print("resume requested but no 'last' checkpoint; starting fresh")

    plateau_ctl = None
    base_lr = cfg["optim"]["algo"]["lr"]
    if cfg["optim"]["schedule"]["name"] == "reduce_on_plateau":
        # normalized like build_optimizer, so reference-style nested
        # overrides (optim.schedule.scheduler.factor=...) reach both
        sc = _normalize_schedule_cfg(cfg["optim"]["schedule"])
        plateau_ctl = schedules.ReduceLROnPlateauController(
            factor=sc.get("factor", 0.1), patience=sc.get("patience", 10)
        )
    plateau_factor = 1.0

    early_stop = None
    es_cfg = (cfg.get("callbacks") or {}).get("early_stopping")
    if es_cfg:
        early_stop = EarlyStopping(
            monitor=es_cfg.get("monitor", "val_eer"),
            min_delta=es_cfg.get("min_delta", 0.0),
            patience=es_cfg.get("patience", 4),
            mode=es_cfg.get("mode", "min"),
            check_finite=es_cfg.get("check_finite", True),
            divergence_threshold=es_cfg.get("divergence_threshold"),
        )

    # jax profiler trace window (the reference's PL profiler configs,
    # SURVEY §5.1); produces a TensorBoard-readable trace
    prof = cfg.get("profiler") or {}
    prof_active = prof.get("name") == "jax_trace"
    prof_start = prof.get("start_step", 10)
    prof_len = prof.get("num_steps", 5)

    step = int(state.step)
    expected_shapes = None
    first_batch_dumped = False
    epoch = resumed_epoch
    dropped_ragged = 0
    stop_reason = None

    # steps_per_dispatch > 1: stack K fixed-shape batches and run K optimizer
    # steps in ONE device program (lax.scan inside make_train_step) — one
    # dispatch + one blocking metrics read per K steps instead of per step.
    # The per-dispatch round trip dominates short steps through a remote-TPU
    # transport, and even locally the host-side device_put/metrics sync per
    # step is dead time the reference's per-batch PL loop cannot avoid.
    # Chunks never straddle validation/max-step/limit/profiler boundaries,
    # so semantics stay step-identical (tests/test_chunked_dispatch.py).
    spd = int(trainer.get("steps_per_dispatch") or 1)
    if spd > 1 and loss_fn_kind in ("speech", "multitask"):
        raise ValueError(
            "steps_per_dispatch needs fixed-shape batches; the speech/"
            "multitask token-budget batcher varies shapes by design"
        )
    chunk_fns = {1: step_fn}

    def get_step_fn(k: int):
        if k not in chunk_fns:
            chunk_fns[k] = make_train_step(
                task, mesh, accumulate_steps=acc,
                return_embeddings=on_step is not None,
                steps_per_dispatch=k,
            )
        return chunk_fns[k]

    def chunk_take() -> int:
        """Steps the next dispatch may run without crossing a step-exact
        boundary (validation, max_steps, limit_train, profiler window)."""
        take = min(spd, max_steps - step, val_every - step % val_every)
        if limit_train:
            take = min(take, limit_train - epoch_batches)
        if prof_active:
            if step < prof_start:
                take = min(take, prof_start - step)
            elif step < prof_start + prof_len:
                take = min(take, prof_start + prof_len - step)
        return max(take, 1)

    buf: List[Dict] = []
    raw_buf: List[Dict] = []  # un-stripped twins of buf, for crash dumps

    def _dump_failed_step_batches():
        """The reference auto-dumps the offending batch when a training step
        raises (speaker_recognition_module.py:187-203, debug_log_batch with
        name='train_step'); same here for every batch of the failed
        dispatch — the raw batches still carry keys and host-only fields."""
        from .debug import dump_first_batch

        dump_dir = (
            pathlib.Path(trainer["checkpoint_dir"]).parent
            / "debug_batch"
            / "train_step"
        )
        for i, rb in enumerate(raw_buf):
            dump_first_batch(
                rb, dump_dir if len(raw_buf) == 1 else dump_dir / f"chunk{i}"
            )
        print(
            f"training step at step={step} raised; offending batch(es) "
            f"dumped to {dump_dir}"
        )

    def run_chunk():
        nonlocal state, step, epoch_batches, buf, raw_buf
        try:
            if prof_active and step == prof_start:
                jax.profiler.start_trace(str(prof["trace_dir"]))
            if len(buf) == 1:
                state, m = get_step_fn(1)(state, shard_batch(buf[0], mesh))
                per_step = [(buf[0], m)]
            else:
                stacked = {
                    key: np.stack([b[key] for b in buf]) for key in buf[0]
                }
                state, sm = get_step_fn(len(buf))(
                    state, shard_batch(stacked, mesh, stacked=True)
                )
                sm = jax.device_get(sm)  # ONE host sync for the whole chunk
                per_step = [
                    (buf[i], {key: v[i] for key, v in sm.items()})
                    for i in range(len(buf))
                ]
            buf = []
            for db_i, m in per_step:
                step += 1
                if on_step is not None:
                    on_step(db_i, m.pop("_embedding", None))
                logger.log_step(step, jax.tree.map(float, m))
                epoch_batches += 1
        except Exception:
            _dump_failed_step_batches()
            raise
        raw_buf = []

    validated_at = -1

    def run_validation():
        nonlocal state, stop_reason, plateau_factor, validated_at
        validated_at = step
        val_metrics = validate_fn(state)
        logger.log_eval(step, val_metrics)
        if not fast_dev:
            # PL disables checkpointing under fast_dev_run
            ckpt.save_step(state, val_metrics, epoch=epoch)
        if plateau_ctl is not None:
            monitor = val_metrics.get(
                "val_eer", val_metrics.get("val_wer", 1.0)
            )
            factor = plateau_ctl.update(float(monitor))
            state = _scale_injected_lr(state, base_lr * factor)
            if factor != plateau_factor:
                plateau_factor = factor
                print(
                    f"plateau: effective lr -> {base_lr * factor:.6g}"
                    f" (factor {factor:g})"
                )
        if early_stop is not None:
            stop_reason = early_stop.update(val_metrics)
            if stop_reason is not None and (
                step < min_steps or epoch < min_epochs
            ):
                # trainer.min_steps / min_epochs (reference
                # trainer.yaml:14-16,19-21, PL Trainer(min_steps/
                # min_epochs=...)): early stopping may not end the run
                # before min_steps optimizer steps AND min_epochs complete
                # epochs have happened
                floor = (
                    f"min_steps={min_steps}" if step < min_steps
                    else f"min_epochs={min_epochs} (at epoch {epoch})"
                )
                print(
                    f"early-stop condition at step {step} suppressed: "
                    f"{floor} not reached ({stop_reason})"
                )
                stop_reason = None
            elif stop_reason is not None:
                print(f"early stopping at step {step}: {stop_reason}")

    # trainer.num_sanity_val_steps (reference trainer.yaml:57-58, PL default
    # 2): run N validation batches BEFORE spending on training so a broken
    # eval path fails at step 0, not at the first val_check_interval. The
    # results are printed/logged but never checkpoint, never feed early
    # stopping, and never move the plateau controller (PL discards them).
    # jax_trace profiling zeroes it like the reference profiler presets
    # (profiler/simple.yaml:23) so the trace window isn't polluted.
    sanity = int(trainer.get("num_sanity_val_steps") or 0)
    if prof_active or fast_dev:
        sanity = 0
    if sanity and step < max_steps:
        print(f"sanity validation: {sanity} batch(es)")
        sanity_metrics = validate_fn(state, max_batches=sanity)
        logger.log_eval(
            step, {f"sanity_{k}": v for k, v in sanity_metrics.items()}
        )

    start_step = step
    while step < max_steps and epoch < max_epochs and stop_reason is None:
        epoch_batches = 0
        buf = []
        raw_buf = []
        for batch in train_iter_fn(epoch):
            db = strip_host_fields(batch)
            if not first_batch_dumped and trainer.get("dump_first_batch"):
                from .debug import dump_first_batch

                dump_first_batch(
                    batch,
                    pathlib.Path(trainer["checkpoint_dir"]).parent
                    / "first_batch",
                )
                first_batch_dumped = True
            if loss_fn_kind not in ("speech", "multitask"):
                # fixed-shape training: skip ragged trailing batches
                # (speech/multitask use token-budget batches whose shapes
                # vary by design; each bucket shape compiles once)
                if expected_shapes is None:
                    expected_shapes = db["features"].shape
                    if expected_shapes[0] % acc:
                        raise ValueError(
                            f"batch size {expected_shapes[0]} not divisible"
                            f" by accumulate_grad_batches={acc}"
                        )
                if db["features"].shape[0] != expected_shapes[0]:
                    # never drop silently: a mis-sized batch stream would
                    # otherwise train on a fraction of the data untraced
                    dropped_ragged += 1
                    print(
                        f"dropped ragged train batch #{dropped_ragged}: "
                        f"leading dim {db['features'].shape[0]} != "
                        f"{expected_shapes[0]}"
                    )
                    continue
            else:
                # pad token-budget batches to a row count divisible by both
                # the data-axis size and the accumulation microbatch count;
                # padded rows have empty targets and are excluded from the
                # CTC mean
                n_data = mesh.shape["data"] * acc
                db = pad_batch_rows(
                    db, -(-db["features"].shape[0] // n_data) * n_data
                )
            buf.append(db)
            raw_buf.append(batch)
            if len(buf) < chunk_take():
                continue
            run_chunk()
            if prof_active and step == prof_start + prof_len:
                jax.tree.map(
                    lambda x: x.block_until_ready(), state.params
                )
                jax.profiler.stop_trace()
                prof_active = False
            if step % val_every == 0 or step >= max_steps:
                run_validation()
                if stop_reason is not None:
                    break
            if step >= max_steps or (
                limit_train and epoch_batches >= limit_train
            ):
                break
        if buf and stop_reason is None and step < max_steps:
            # iterator exhausted mid-chunk (steps_per_dispatch > 1): train
            # the partial chunk rather than dropping batches silently
            run_chunk()
            if step % val_every == 0 or step >= max_steps:
                run_validation()
        if stop_reason is not None:
            break
        if limit_train and step < max_steps and validated_at != step:
            # limit_train_batches caps batches PER EPOCH (PL semantics: the
            # reference debug_trainer pairs limit_train_batches=10 with
            # max_epochs=1000, debug_trainer.yaml:10-15) — validate at the
            # capped epoch end (unless the cap landed exactly on a val
            # boundary and this step was already validated above) and keep
            # training into the next epoch until max_steps.
            run_validation()
            if stop_reason is not None:
                break
        if epoch_batches == 0:
            raise RuntimeError("train loader yielded no usable batches")
        epoch += 1
    if (
        epoch >= max_epochs
        and step < max_steps
        and stop_reason is None
        and step > start_step
        and validated_at != step
        and not fast_dev
    ):
        # the epoch cap ended training between step-interval validations:
        # score + checkpoint the final weights (PL validates at every epoch
        # end, so a max_epochs-terminated reference run never leaves its
        # last epoch unscored)
        run_validation()
    if dropped_ragged:
        print(f"total ragged train batches dropped: {dropped_ragged}")
    # fast_dev_run saved no checkpoints: test on the current weights
    return state, (None if fast_dev else ckpt)


def _limit_test_batches(cfg) -> Optional[int]:
    """trainer.limit_test_batches (reference trainer.yaml:44-48, PL): null →
    the full test split, 0 → skip the test phase entirely (the reference's
    debug_trainer sets 0, debug_trainer.yaml:12), N → at most N batches."""
    v = cfg["trainer"].get("limit_test_batches")
    return None if v is None else int(v)


def _restore_best(state, ckpt, average_top_k: int = 1):
    """Post-fit checkpoint selection (reference main.py:517-528): with a fit
    run, test the best-val checkpoint; in eval-only mode (`ckpt is None`,
    fit_model=false) or when no validation epoch ever ran, test the current
    module weights. `average_top_k > 1` (with `trainer.save_top_k >= k`)
    tests the uniform average of the best-k checkpoints instead —
    checkpoint averaging, a beyond-reference eval option."""
    if ckpt is None:
        return state
    try:
        if average_top_k > 1:
            return ckpt.average_best(state, average_top_k)
        return ckpt.restore(state, name="best")
    except FileNotFoundError:
        return state


def _run_speaker(cfg, dm, task: SpeakerTask, mesh, logger) -> float:
    dl = cfg["data"]["dataloader"]
    n_data = mesh.shape["data"]
    evaluator = build_evaluator(cfg)
    example = strip_host_fields(next(iter(dm.train_batches())))
    state = _init_state(cfg, task, example)
    embed = make_embed_fn(task, mesh)

    val_pairs = dm.val_evaluation_pairs()
    limit_val = cfg["trainer"].get("limit_val_batches")

    # tracked-sample embedding progress (working re-design of the
    # reference's dead-code progress_tracker_callback.py, SURVEY §2.7)
    tracker = None
    pt_cfg = (cfg.get("callbacks") or {}).get("progress_tracker")
    if pt_cfg and not cfg.get("fit_model", True):
        # snapshots are taken at validation during fit; eval-only runs would
        # pay the probe-selection decode for nothing
        print("progress tracker: fit_model=false, skipping")
        pt_cfg = None
    if pt_cfg:
        from .progress import ProgressTracker

        tracker = ProgressTracker(
            out_dir=pathlib.Path(
                str(cfg["trainer"]["checkpoint_dir"])
            ).parent
            / "progress",
            num_speakers=int(pt_cfg.get("num_tracked_speakers", 5)),
            per_speaker=int(pt_cfg.get("per_speaker", 2)),
            heatmap=bool(pt_cfg.get("heatmap", True)),
            max_scan_batches=int(pt_cfg.get("max_scan_batches", 100)),
        )
        if not tracker.select_samples(dm.train_batches()):
            print("progress tracker: no tracked-speaker samples; disabled")
            tracker = None

    # rolling buffer of training embeddings for evaluator centering: filled
    # for free from the train step's own forward instead of re-running the
    # train pipeline at each validation (reference keeps an in-training
    # deque, speaker_recognition_module.py:79,132-146)
    max_tr = int(evaluator.max_num_training_samples or 0)
    emb_buffer: Deque = deque(maxlen=max_tr) if max_tr else None

    def on_step(db, emb):
        if emb_buffer is None or emb is None:
            return
        e = np.asarray(emb)
        labels = np.asarray(db["labels"]).reshape(-1)
        for j in range(min(len(e), len(labels))):
            emb_buffer.append((e[j], int(labels[j])))

    def fit_evaluator_from_train(state):
        if emb_buffer:
            embs, labels = zip(*emb_buffer)
            evaluator.fit_parameters(list(embs), list(labels))
        else:
            tr_embs, tr_labels = collect_train_embeddings(state, max_tr)
            evaluator.fit_parameters(tr_embs, tr_labels)

    def collect_train_embeddings(state, max_samples):
        embs, labels = [], []
        for batch in dm.train_batches():
            db = strip_host_fields(batch)
            if db["features"].shape[0] != example["features"].shape[0]:
                continue
            # fixed-crop batches omit the (all-valid) mask at collate time
            m = db.get("mask")
            if m is None:
                m = np.ones(db["features"].shape[:2], bool)
            e = np.asarray(
                embed(state, jnp.asarray(db["features"]), jnp.asarray(m))
            )
            embs.extend(e)
            labels.extend(np.asarray(db["labels"]).tolist())
            if len(embs) >= max_samples:
                break
        return embs[:max_samples], labels[:max_samples]

    def validate(state, max_batches=None):
        # max_batches: sanity-validation override (num_sanity_val_steps);
        # the progress tracker only snapshots real validations
        track = (
            tracker.snapshot(
                int(state.step),
                lambda f, m: _embed_feature_batch(
                    embed, state, {"features": f, "mask": m}, n_data
                ),
            )
            if tracker and max_batches is None
            else {}
        )
        if not val_pairs:
            return {**track, "val_eer": 1.0}
        lim = max_batches if max_batches is not None else limit_val
        samples: List[EmbeddingSample] = []
        for i, batch in enumerate(dm.val_batches()):
            if lim and i >= lim:
                break
            e = _embed_feature_batch(
                embed, state, strip_host_fields(batch), n_data
            )
            samples.extend(
                EmbeddingSample(k, e[j]) for j, k in enumerate(batch["keys"])
            )
        seen = {s.sample_id for s in samples}
        usable = [
            p for p in val_pairs if p.sample1_id in seen and p.sample2_id in seen
        ]
        if not usable:
            return {**track, "val_eer": 1.0}
        evaluator.reset_parameters()
        if max_tr:
            fit_evaluator_from_train(state)
        res = evaluator.evaluate(usable, samples)
        return {**track, "val_eer": res["eer"], "val_mdc": res["mdc"]}

    def make_batch_processor(epoch):
        """Triplet modes need >= 2 samples per present speaker so every
        anchor has an in-batch positive (the reference routes triplet losses
        through TripletSpeakerBatchProcessor, voxceleb.py:888-1062); all
        other modes use uniform random batches."""
        if task.mode not in ("triplet", "triplet_ce"):
            return None
        from ..data.batching import TripletBatchProcessor
        from ..data.samples import collate_speaker_batch

        return TripletBatchProcessor(
            max_batch_size=dl["batch_size"],
            max_queue_size=_queue_size(cfg),
            collate_fn=collate_speaker_batch,
            seed=cfg["seed"] + epoch * 9973,
        )

    def train_iter(epoch=0):
        return dm.train_batches(
            batch_processor=make_batch_processor(epoch),
            prefetch_depth=dl.get("prefetch_depth", 4),
            epoch=epoch,
        )

    state, ckpt = _train_loop(
        cfg, task, state, mesh, logger, train_iter, validate,
        on_step=on_step if max_tr else None,
    )

    # ---- test on best checkpoint (full utterances)
    state = _restore_best(
        state, ckpt, int(cfg["trainer"].get("average_top_k", 1))
    )
    if not cfg.get("eval_model", True):
        logger.close()
        return None
    ltb = _limit_test_batches(cfg)
    if ltb == 0:
        print("limit_test_batches=0: skipping the test phase")
        logger.close()
        return None
    test_pairs = dm.test_evaluation_pairs()
    if not test_pairs:
        final = validate(state)
        logger.close()
        return float(final["val_eer"])
    test_samples = list(dm.test_samples())
    if ltb:
        test_samples = test_samples[: ltb * dl.get("test_batch_size", 8)]
    net = cfg["network"]
    if net.get("use_transformers_as_ensembles") and net["name"] == "wav2vec2_fc":
        # per-transformer-layer ensemble embeddings, scores averaged by the
        # evaluator (wav2vec2_fc.py:440-463 / cosine_distance.py:134-185)
        num_e = int(net.get("num_ensembles", 12))

        @jax.jit
        def ens_embed(state, feats, mask):
            return task.model.apply(
                {"params": state.params, **state.model_state},
                feats,
                mask,
                num_ensembles=num_e,
                method=Wav2Vec2SpeakerModel.compute_ensemble_embeddings,
            )

        samples = extract_embeddings(
            ens_embed,
            state,
            test_samples,
            pad_to_multiple=dl.get("test_pad_to_multiple", 16000),
            batch_size=dl.get("test_batch_size", 8),
            num_devices=n_data,
            ensemble=True,
        )
    else:
        samples = extract_embeddings(
            embed,
            state,
            test_samples,
            pad_to_multiple=dl.get("test_pad_to_multiple", 16000),
            batch_size=dl.get("test_batch_size", 8),
            num_devices=n_data,
        )
    if ltb:
        # a capped extraction covers only a prefix of the test split: score
        # only the trials whose both sides were embedded
        seen = {s.sample_id for s in samples}
        test_pairs = [
            p for p in test_pairs
            if p.sample1_id in seen and p.sample2_id in seen
        ]
        if not test_pairs:
            print("limit_test_batches: no scoreable test trials; skipping")
            logger.close()
            return None
    evaluator.reset_parameters()
    if max_tr:
        # test-time centering re-extracts with the restored best checkpoint
        # (the rolling buffer holds last-params embeddings)
        tr_embs, tr_labels = collect_train_embeddings(state, max_tr)
        evaluator.fit_parameters(tr_embs, tr_labels)
    res = evaluator.evaluate(test_pairs, samples)
    logger.log_eval(int(state.step), {f"test_{k}": v for k, v in res.items()},
                    split="test")
    logger.close()
    return float(res["eer"])


def _warn_unsupported_progress_tracker(cfg, family: str) -> None:
    """The tracked-sample progress callback is speaker-task-only (it probes
    train-speaker embeddings); never drop a configured callback silently."""
    if (cfg.get("callbacks") or {}).get("progress_tracker"):
        print(
            f"progress tracker: unsupported for the {family} task family; "
            "callback ignored"
        )


def _run_paired(cfg, dm, task: PairedSpeakerTask, mesh, logger) -> float:
    _warn_unsupported_progress_tracker(cfg, "paired")
    dl = cfg["data"]["dataloader"]
    ratio = cfg.get("pos_neg_training_batch_ratio", 0.5)
    k = cfg["data"]["shards"]["sequential_same_speaker_samples"]

    def train_iter(epoch=0):
        proc = PairedBatchProcessor(
            batch_size=dl["batch_size"],
            max_queue_size=_queue_size(cfg),
            mode="generate",
            sequential_same_speaker_samples=k,
            collate_fn=collate_paired_batch,
            pos_neg_training_batch_ratio=ratio,
            seed=cfg["seed"] + epoch * 9973,
        )
        return proc(dm._pipeline("train", train=True, epoch=epoch))

    example = strip_host_fields(next(iter(train_iter())))
    state = _init_state(cfg, task, example)
    # val/test scoring shards the trial batch over the mesh data axis like
    # make_eval_step (params replicated) — multi-chip eval matches the
    # training-side sharding contract instead of running on one device
    score_fn = jax.jit(
        lambda state, batch: task.score_fn(
            state.params, state.model_state, batch
        ),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )

    def score_pairs(state, pairs, split, max_batches=None):
        proc = PairedBatchProcessor(
            batch_size=dl["batch_size"],
            max_queue_size=max(_queue_size(cfg), len(pairs) + 1),
            mode="reproduce",
            sequential_same_speaker_samples=1,
            collate_fn=lambda s: collate_paired_batch(
                s, pad_to_multiple=dl.get("test_pad_to_multiple", 16000)
            ),
            pairs=pairs,
        )
        gts, scores = [], []
        n_data = mesh.shape["data"]
        target_bs = -(-dl["batch_size"] // n_data) * n_data
        sample_iter = (
            dm._pipeline(split, train=False)
            if split == "val"
            else dm.test_samples()
        )
        for i, batch in enumerate(proc(sample_iter)):
            if max_batches is not None and i >= max_batches:
                break
            db = strip_host_fields(batch)
            n = db["labels"].shape[0]
            db = pad_batch_rows(db, target_bs)
            s = np.asarray(score_fn(state, db))[:n]
            scores.extend(s.tolist())
            gts.extend(np.asarray(batch["labels"]).tolist())
        return paired_scores_to_metrics(gts, scores)

    val_pairs = dm.val_evaluation_pairs()
    limit_val = cfg["trainer"].get("limit_val_batches")

    def validate(state, max_batches=None):
        if not val_pairs:
            return {"val_eer": 1.0}
        m = score_pairs(
            state, val_pairs, "val",
            max_batches=max_batches if max_batches is not None else limit_val,
        )
        return {"val_eer": m["eer"], "val_mdc": m["mdc"]}

    state, ckpt = _train_loop(
        cfg, task, state, mesh, logger, train_iter, validate,
        loss_fn_kind="paired",
    )
    state = _restore_best(
        state, ckpt, int(cfg["trainer"].get("average_top_k", 1))
    )
    if not cfg.get("eval_model", True):
        logger.close()
        return None
    ltb = _limit_test_batches(cfg)
    if ltb == 0:
        print("limit_test_batches=0: skipping the test phase")
        logger.close()
        return None
    test_pairs = dm.test_evaluation_pairs()
    if not test_pairs:
        final = validate(state)
        logger.close()
        return float(final["val_eer"])
    res = score_pairs(state, test_pairs, "test", max_batches=ltb)
    logger.log_eval(int(state.step), {f"test_{k}": v for k, v in res.items()},
                    split="test")
    logger.close()
    return float(res["eer"])


def _make_transcription_tracker(
    raw_batch, tokenizer, jit_logits, eval_rows, logger
):
    """Track one training utterance and log the model's transcription of it
    at every validation — the reference's `_log_transcription_progress`
    (speech_recognition_module.py:249-288): the ground truth is logged once,
    the current hypothesis at each flush. Text goes to console + the
    TensorBoard text plugin (tb_writer.add_text)."""
    feats = np.asarray(raw_batch["features"][:1])
    mask = np.asarray(raw_batch["mask"][:1])
    truth = raw_batch["transcriptions"][0]
    logger.log_text(0, "train/tracked_ground_truth", truth)

    def track(state):
        db = pad_batch_rows(
            {"features": feats, "mask": mask}, eval_rows, mask_fill=True
        )
        logits, lengths = jit_logits(state, db["features"], db["mask"])
        hyp = tokenizer.decode_batch(
            np.asarray(logits)[:1], np.asarray(lengths)[:1]
        )[0]
        logger.log_text(int(state.step), "train/tracked_transcription", hyp)

    return track


def _make_wer_fn(dm, task, jit_logits, eval_bs: int, eval_rows: int):
    """Shared val/test WER helper for the speech-bearing families
    (`_run_speech`, `_run_multitask`): collect a split's token-budget
    batches, run the jitted mesh-sharded logits fn per bucket shape,
    decode + WER host-side (reference speech_recognition_module.py:178-231)."""

    def _wer(state, split, limit=None):
        batches = []
        for i, b in enumerate(dm.eval_batches(split, batch_size=eval_bs)):
            if limit and i >= limit:
                break
            batches.append(b)
        if not batches:
            return None
        return task.evaluate_wer(
            state.params,
            state.model_state,
            batches,
            logits_fn=lambda feats, mask: jit_logits(state, feats, mask),
            pad_rows_to=eval_rows,
        )["wer"]

    return _wer


def _embed_feature_batch(embed, state, db, n_data: int) -> np.ndarray:
    """Pad a feature batch's rows to a multiple of the mesh data axis, run
    the sharded embed fn, slice back to the true row count."""
    feats, mask = db["features"], db.get("mask")
    if mask is None:
        mask = np.ones(feats.shape[:2], bool)
    padded = pad_batch_rows(
        {"features": feats, "mask": mask},
        -(-feats.shape[0] // n_data) * n_data,
    )
    return np.asarray(
        embed(
            state,
            jnp.asarray(padded["features"]),
            jnp.asarray(padded["mask"]),
        )
    )[: feats.shape[0]]


def _run_speech(cfg, dm, task: SpeechTask, mesh, logger) -> float:
    _warn_unsupported_progress_tracker(cfg, "speech")
    raw_example = next(iter(dm.train_batches()))
    example = strip_host_fields(raw_example)
    state = _init_state(cfg, task, example)
    limit_val = cfg["trainer"].get("limit_val_batches")

    # jitted + mesh-sharded eval forward: one device program per bucket
    # shape (pad_to_multiple time buckets x fixed row count) instead of the
    # reference's eager per-batch dispatch (speech_recognition_module.py:
    # 178-231); greedy decode stays host-side
    jit_logits = make_logits_fn(task, mesh)
    n_data = mesh.shape["data"]
    eval_bs = int(cfg["data"]["dataloader"].get("eval_batch_size", 8))
    eval_rows = -(-eval_bs // n_data) * n_data
    track_transcription = _make_transcription_tracker(
        raw_example, task.tokenizer, jit_logits, eval_rows, logger
    )
    _wer = _make_wer_fn(dm, task, jit_logits, eval_bs, eval_rows)

    def validate(state, max_batches=None):
        track_transcription(state)
        lim = max_batches if max_batches is not None else limit_val
        metrics = {}
        for split in ("val_clean", "val_other"):
            if split not in dm.cfg.split_dirs:
                continue
            wer = _wer(state, split, limit=lim)
            if wer is not None:
                metrics[f"val_wer_{split.split('_')[1]}"] = wer
        metrics["val_wer"] = metrics.get(
            "val_wer_clean", next(iter(metrics.values()), 1.0)
        )
        return metrics

    def train_iter(epoch=0):
        return dm.train_batches(epoch=epoch)

    state, ckpt = _train_loop(
        cfg, task, state, mesh, logger, train_iter, validate,
        loss_fn_kind="speech",
    )
    state = _restore_best(
        state, ckpt, int(cfg["trainer"].get("average_top_k", 1))
    )
    if not cfg.get("eval_model", True):
        logger.close()
        return None
    ltb = _limit_test_batches(cfg)
    if ltb == 0:
        print("limit_test_batches=0: skipping the test phase")
        logger.close()
        return None
    results = {}
    for split in ("test_clean", "test_other"):
        if split in dm.cfg.split_dirs:
            wer = _wer(state, split, limit=ltb)
            if wer is not None:
                results[split] = wer
    if results:
        logger.log_eval(
            int(state.step),
            {f"{k}_wer": v for k, v in results.items()},
            split="test",
        )
    # fall back to a val-WER pass ONLY when no test split produced one,
    # and before the logger closes (validate() logs tracked transcriptions)
    if "test_clean" in results:
        objective = results["test_clean"]
    else:
        objective = validate(state)["val_wer"]
    logger.close()
    return float(objective)


def _run_multitask(cfg, dm, task, mesh, logger) -> float:
    """Joint speaker + speech run over LibriSpeech shards.

    The reference declares this family but never built it
    (`mt_speech_speaker_module.py` — all steps `pass`; `main.py:304-307`
    raises). Here: token-budget speech batches carry speaker labels, one
    shared-backbone pjit step drives CTC + CE/AAM, and validation reports
    both corpus WER (jitted bucketed logits path, like `_run_speech`) and
    cosine EER over balanced same/different-speaker trial pairs (like
    `_run_speaker`). The objective returned is the test EER (speaker
    verification is the repo's headline task); test WER is logged beside it.
    """
    _warn_unsupported_progress_tracker(cfg, "multitask")
    raw_example = next(iter(dm.train_batches()))
    example = strip_host_fields(raw_example)
    state = _init_state(cfg, task, example)
    limit_val = cfg["trainer"].get("limit_val_batches")
    evaluator = build_evaluator(cfg)

    jit_logits = make_logits_fn(task, mesh)
    embed = make_embed_fn(task, mesh)
    n_data = mesh.shape["data"]
    eval_bs = int(cfg["data"]["dataloader"].get("eval_batch_size", 8))
    eval_rows = -(-eval_bs // n_data) * n_data
    track_transcription = _make_transcription_tracker(
        raw_example, task.tokenizer, jit_logits, eval_rows, logger
    )

    val_splits = [s for s in ("val_clean", "val_other") if s in dm.cfg.split_dirs]
    num_pairs = int(cfg["data"]["module"].get("num_val_pairs", 200))
    val_pairs = (
        dm.val_evaluation_pairs(val_splits[0], num_pairs) if val_splits else []
    )

    _wer = _make_wer_fn(dm, task, jit_logits, eval_bs, eval_rows)

    def _embeddings(state, split, limit=None):
        samples: List[EmbeddingSample] = []
        for i, batch in enumerate(dm.eval_batches(split, batch_size=eval_bs)):
            if limit and i >= limit:
                break
            e = _embed_feature_batch(
                embed, state, strip_host_fields(batch), n_data
            )
            samples.extend(
                EmbeddingSample(k, e[j]) for j, k in enumerate(batch["keys"])
            )
        return samples

    def _eer(state, split, pairs, limit=None):
        if not pairs:
            return None
        samples = _embeddings(state, split, limit=limit)
        seen = {s.sample_id for s in samples}
        usable = [
            p for p in pairs if p.sample1_id in seen and p.sample2_id in seen
        ]
        if not usable:
            return None
        evaluator.reset_parameters()
        if evaluator.max_num_training_samples:
            # centering statistics from train-split embeddings (the
            # reference's mean/std-norm cosine variants)
            max_tr = int(evaluator.max_num_training_samples)
            tr_embs, tr_labels = [], []
            for batch in dm.train_batches():
                db = strip_host_fields(batch)
                e = _embed_feature_batch(embed, state, db, n_data)
                tr_embs.extend(e)
                tr_labels.extend(
                    np.asarray(db["speaker_labels"]).tolist()[: len(e)]
                )
                if len(tr_embs) >= max_tr:
                    break
            evaluator.fit_parameters(tr_embs[:max_tr], tr_labels[:max_tr])
        return evaluator.evaluate(usable, samples)

    def validate(state, max_batches=None):
        track_transcription(state)
        lim = max_batches if max_batches is not None else limit_val
        metrics = {}
        for split in val_splits:
            wer = _wer(state, split, limit=lim)
            if wer is not None:
                metrics[f"val_wer_{split.split('_')[1]}"] = wer
        metrics["val_wer"] = metrics.get("val_wer_clean", 1.0)
        res = (
            _eer(state, val_splits[0], val_pairs, limit=max_batches)
            if val_splits
            else None
        )
        if res is not None:
            metrics["val_eer"] = res["eer"]
            metrics["val_mdc"] = res["mdc"]
        else:
            metrics["val_eer"] = 1.0
        return metrics

    def train_iter(epoch=0):
        return dm.train_batches(epoch=epoch)

    state, ckpt = _train_loop(
        cfg, task, state, mesh, logger, train_iter, validate,
        loss_fn_kind="multitask",
    )
    state = _restore_best(
        state, ckpt, int(cfg["trainer"].get("average_top_k", 1))
    )
    if not cfg.get("eval_model", True):
        logger.close()
        return None

    ltb = _limit_test_batches(cfg)
    if ltb == 0:
        print("limit_test_batches=0: skipping the test phase")
        logger.close()
        return None
    results = {}
    test_splits = [
        s for s in ("test_clean", "test_other") if s in dm.cfg.split_dirs
    ]
    for split in test_splits:
        wer = _wer(state, split, limit=ltb)
        if wer is not None:
            results[f"{split}_wer"] = wer
    test_eer = None
    if test_splits:
        test_pairs = dm.val_evaluation_pairs(test_splits[0], num_pairs)
        res = _eer(state, test_splits[0], test_pairs, limit=ltb)
        if res is not None:
            test_eer = res["eer"]
            results["test_eer"] = test_eer
            results["test_mdc"] = res["mdc"]
    if results:
        logger.log_eval(int(state.step), results, split="test")
    if test_eer is None:
        # fallback val pass must run before close(): validate() logs
        # tracked transcriptions through this logger
        test_eer = validate(state)["val_eer"]
    logger.close()
    return float(test_eer)
