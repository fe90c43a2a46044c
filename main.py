"""GCDLSS-TPU command-line launcher.

Argument surface mirrors the reference CLI (`main.py:18-59`):

    python main.py -s 1 --dataset SemanticKITTI \
        --dataset_config gcdlss_tpu/configs/semkitti_minkunet.yaml \
        --module ExpPretrain --experiment pretrain-split1 --use_scheduler

    python main.py -s 1 --dataset SemanticKITTI --use_scheduler \
        --module ExpMergeDiscover_LaserMix_MeanTeacher_NCCAdaptive \
        --pretrained checkpoints/pretrain --epochs 50 --batch_size 4

Split tables (`main.py:87-113`): KITTI s1 unk=[4,6] 50%, s2=[2,4,5] 45%,
s3=[3,6,9] 40%; nuScenes s1=[1,8] 45%, s2=[1,2,5] 35%, s3=[0,4,7,8] 25%.
Split index files are regenerated deterministically if absent (the reference's
`split_npy/` content is missing from its snapshot).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

# persistent XLA compilation cache: the big sparse-UNet programs take minutes
# to compile on this rig; cache hits make reruns instant
import os as _os
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


SEED = 1234


def resolve_discover_overrides(module_name: str, dataset: str) -> dict:
    """Merge-branch config resolution: registry recipe over dataset defaults.

    Mirrors the reference CLI's substring dispatch of every
    Merge/threshold/LiON/Sinkhorn variant (`/root/reference/main.py:172-293`)
    as DiscoverConfig keyword overrides. Exposed at module level so tests can
    assert each registry name resolves to the right configuration.
    """
    from gcdlss_tpu.train.discover import make_discover_config
    from gcdlss_tpu.train.registry import resolve_module

    stage, overrides = resolve_module(module_name)
    if stage != "discover":
        raise NameError(f"{module_name} is not a Merge/Discover module")
    return make_discover_config(dataset, **overrides)

def resume_from_checkpoint(mgr, state, resume_arg):
    """`--resume_checkpoint` restore for the epoch-loop recipes.

    Returns (state, start_epoch). The reference resumes ANY branch by passing
    the checkpoint path to the PL Trainer (`/root/reference/main.py:173-183`);
    here the arg value may name another experiment's checkpoint dir, and any
    other truthy value resumes from this experiment's own latest save (epoch-
    keyed by the training loops below).
    """
    from gcdlss_tpu.train.checkpoint import CheckpointManager

    if not resume_arg:
        return state, 0
    src = mgr
    if isinstance(resume_arg, str) and os.path.isdir(resume_arg):
        src = CheckpointManager(resume_arg)
    restored = src.restore(state)
    if restored is None:
        print("WARNING: --resume_checkpoint found no restorable step; "
              "starting fresh")
        return state, 0
    start = int(src.latest_step()) + 1
    print(f"resumed from saved epoch {start - 1}")
    return restored, start


# NB: value flags default to None so a `--dataset_config` YAML can supply
# them (main() drops None overrides before load_config merges YAML with
# flags); the effective defaults live in one place, ExperimentConfig, and
# match the reference CLI defaults (`/root/reference/main.py:18-59`).
parser = ArgumentParser()
parser.add_argument("-s", "--split", default=None, type=int, required=False)
parser.add_argument("--dataset",
                    choices=["SemanticKITTI", "nuScenes", "SemanticPOSS"],
                    default=None, type=str)
parser.add_argument("--dataset_config", default=None, type=str)
parser.add_argument("--dataset_path", default=None, type=str)
parser.add_argument("--voxel_size", default=None, type=float)
parser.add_argument("--downsampling", default=None, type=int)
parser.add_argument("--batch_size", default=None, type=int)
parser.add_argument("--num_workers", default=None, type=int)
parser.add_argument("--loader_backend", default=None, type=str,
                    choices=(None, "thread", "process"),
                    help="host loader worker backend (default: thread)")
parser.add_argument("--log_dir", default=None, type=str)
parser.add_argument("--checkpoint_dir", default=None, type=str)
parser.add_argument("--pretrained", type=str, default=None,
                    help="Stage-1 checkpoint dir for Stage-2 warm start")
parser.add_argument("--resume_checkpoint", type=str, default=None)
parser.add_argument("--checkpoint", type=str, default=None)
parser.add_argument("--train_lr", default=None, type=float)
parser.add_argument("--finetune_lr", default=None, type=float)
parser.add_argument("--use_scheduler", default=None, action="store_true")
parser.add_argument("--warmup_epochs", default=None, type=int)
parser.add_argument("--min_lr", default=None, type=float)
parser.add_argument("--momentum_for_optim", default=None, type=float)
parser.add_argument("--weight_decay_for_optim", default=None, type=float)
parser.add_argument("--experiment", default=None, type=str)
parser.add_argument("--epochs", type=int, default=None)
parser.add_argument("--set_deterministic", default=True, action="store_true")
parser.add_argument("--visualize", default=None, action="store_true")
parser.add_argument("--test", default=None, action="store_true")
parser.add_argument("--debug", default=None, action="store_true")
parser.add_argument("--module", type=str, default=None)
parser.add_argument("--arch", type=str, default=None)
parser.add_argument("--split_dir", type=str, default=None)
parser.add_argument("--voxel_cap", type=int, default=None)


def main(args):
    import jax

    # This image's sitecustomize force-registers the axon TPU plugin through
    # jax.config, silently overriding the JAX_PLATFORMS env var — re-assert
    # it BEFORE anything touches a backend (enable_compile_cache calls
    # jax.default_backend(), which would otherwise initialize the TPU even
    # for `JAX_PLATFORMS=cpu python main.py ...` CPU smoke runs) and verify
    # the pin took rather than swallowing failures.
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)
        assert jax.default_backend() in want, (
            f"requested JAX_PLATFORMS={want}, got {jax.default_backend()}"
        )

    from gcdlss_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from gcdlss_tpu.config import ExperimentConfig, load_config
    from gcdlss_tpu.data import (
        SemanticKITTIDataset,
        ensure_split_file,
        load_split_indices,
        PrefetchLoader,
        MultiprocessLoader,
    )
    from gcdlss_tpu.data.semantic_kitti import get_dataset
    from gcdlss_tpu.train.checkpoint import CheckpointManager, save_pretrained, load_pretrained
    from gcdlss_tpu.utils.logging import MetricsLogger

    overrides = {k: v for k, v in vars(args).items() if v is not None}
    cfg = load_config(args.dataset_config, **overrides)
    # host loader backend: forked worker processes sidestep the GIL on
    # multi-core hosts (torch DataLoader analog, /root/reference/main.py:27)
    PrefetchLoader = (
        MultiprocessLoader
        if getattr(cfg, "loader_backend", None) == "process"
        else PrefetchLoader
    )
    if args.set_deterministic:
        np.random.seed(SEED)

    space = cfg.label_space()
    print(f"Unknown labels in split {cfg.split}:")
    for lab in space["unknown_labels"]:
        raw = space["meta"]["learning_map_inv"][lab]
        print(f"  {lab}: {space['meta']['labels'][raw]}")

    caps = cfg.resolved_caps()
    point_cap = cfg.point_cap or cfg.downsampling

    logger = MetricsLogger(cfg.log_dir, cfg.experiment)
    ds_cls = get_dataset(cfg.dataset, "disjoint")

    # split indices (regenerated if missing)
    probe = ds_cls(cfg.dataset_path, "train")
    split_path = ensure_split_file(
        cfg.split_dir, cfg.dataset, cfg.split, len(probe)
    )
    split_idx = load_split_indices(split_path)

    # module-name -> (loop recipe, config overrides), like the reference's
    # substring dispatch over experiment classes (`main.py:172-293`)
    from gcdlss_tpu.train.registry import resolve_module
    recipe, mod_overrides = resolve_module(cfg.module)

    if recipe == "pretrain":
        from gcdlss_tpu.train.pretrain import PretrainConfig, ExpPretrain

        pcfg = PretrainConfig(
            num_labeled_classes=space["num_labeled_classes"],
            num_classes=space["num_classes"],
            unknown_label=space["unknown_label"],
            voxel_caps=caps,
            arch=cfg.arch,
            lr=cfg.train_lr,
            momentum=cfg.momentum_for_optim,
            weight_decay=cfg.weight_decay_for_optim,
            use_scheduler=cfg.use_scheduler,
            warmup_epochs=cfg.warmup_epochs,
            min_lr=cfg.min_lr,
            epochs=cfg.epochs,
            steps_per_epoch=max(1, len(split_idx) // cfg.batch_size),
            **mod_overrides,
        )
        module = ExpPretrain(pcfg, space["label_mapping"], space["label_mapping_inv"])
        train_ds = ds_cls(
            cfg.dataset_path, "train", split_indices=split_idx, labeled=True,
            voxel_size=cfg.voxel_size, downsampling=cfg.downsampling,
            augment=True, label_mapping=space["label_mapping"],
            unknown_labels=space["unknown_labels"], seed=SEED,
        )
        val_ds = ds_cls(
            cfg.dataset_path, "valid", voxel_size=cfg.voxel_size,
            label_mapping=space["label_mapping"],
            unknown_labels=space["unknown_labels"],
        )
        if cfg.debug:
            train_ds.num_files = min(train_ds.num_files, 50)
            val_ds.num_files = min(val_ds.num_files, 50)
        mgr = CheckpointManager(os.path.join(cfg.checkpoint_dir, cfg.experiment))
        if cfg.test:
            # `--test --checkpoint <dir>` evaluates the restored model (the
            # reference loads a checkpoint in test mode, `main.py:144-167`);
            # without --checkpoint, fall back to this experiment's latest.
            src = CheckpointManager(cfg.checkpoint) if cfg.checkpoint else mgr
            restored = src.restore(module.state)
            if restored is not None:
                module.state = restored
            elif cfg.checkpoint:
                raise FileNotFoundError(
                    f"--checkpoint {cfg.checkpoint} has no restorable step"
                )
            loader = PrefetchLoader(val_ds, cfg.batch_size, caps[0],
                                    point_cap=point_cap, shuffle=False,
                                    num_workers=cfg.num_workers, drop_last=False)
            print(module.validate(loader))
            return
        module.state, start_epoch = resume_from_checkpoint(
            mgr, module.state, cfg.resume_checkpoint)
        for epoch in range(start_epoch, cfg.epochs):
            loader = PrefetchLoader(train_ds, cfg.batch_size, caps[0],
                                    num_workers=cfg.num_workers, seed=epoch)
            loss = module.train_epoch(loader)
            vloader = PrefetchLoader(val_ds, cfg.batch_size, caps[0],
                                     point_cap=point_cap, shuffle=False,
                                     num_workers=cfg.num_workers, drop_last=False)
            vm = module.validate(vloader)
            logger.log_dict(
                {"train/loss": loss, "valid/mIoU": vm["mIoU"],
                 "valid/mIoU_old": vm["mIoU_old"], "valid/loss": vm["loss"]},
                epoch,
            )
            print(f"epoch {epoch}: loss={loss:.4f} mIoU={vm['mIoU']:.4f}")
            mgr.save(epoch, module.state)
        save_pretrained(
            os.path.join(cfg.checkpoint_dir, cfg.experiment), module.state.params
        )

    elif recipe in ("finetune", "finetune_extra", "finetune_test",
                    "uncertainty"):
        # Stage 1.5 family: NCC-head calibration + mixing/scheduling ablations
        # (`modules/exp.py:505-687,1306-2798`), the uncertainty ranking
        # module (`exp.py:2799-2998`), and the test-only threshold sweeps
        # (`exp.py:3000-3290`)
        from gcdlss_tpu.train.finetune import (
            FineTuneConfig, create_finetune_state, finetune_train_step,
            finetune_extra_train_step,
        )
        from gcdlss_tpu.train.common import voxel_batch_to_device

        overrides = dict(mod_overrides)
        subdivide_novel = overrides.pop("subdivide_novel", False)
        half = caps[0] // 2
        if recipe == "finetune_extra":
            overrides.setdefault("sup_voxel_cap", half)
            overrides.setdefault("num_sup_scans", max(cfg.batch_size // 2, 1))
        fkw = dict(
            num_labeled_classes=space["num_labeled_classes"],
            num_classes=space["num_classes"],
            unknown_label=space["unknown_label"],
            voxel_caps=caps,
            arch=cfg.arch,
            calib_coeff=0.15 if cfg.dataset == "nuScenes" else 0.05,
            lr=cfg.finetune_lr,
            momentum=cfg.momentum_for_optim,
            weight_decay=cfg.weight_decay_for_optim,
            use_scheduler=cfg.use_scheduler,
            warmup_epochs=cfg.warmup_epochs,
            min_lr=cfg.min_lr,
            epochs=cfg.epochs,
            steps_per_epoch=max(1, len(split_idx) // cfg.batch_size),
        )
        fkw.update(overrides)  # registry recipe wins (e.g. ExpRCExtra 0.01)
        fcfg = FineTuneConfig(**fkw)
        pretrained = None
        if cfg.pretrained:
            from gcdlss_tpu.train.pretrain import PretrainConfig, create_pretrain_state

            tmpl_cfg = PretrainConfig(
                num_labeled_classes=space["num_labeled_classes"],
                num_classes=space["num_classes"],
                unknown_label=space["unknown_label"],
                voxel_caps=caps, arch=cfg.arch,
            )
            tmpl = create_pretrain_state(jax.random.PRNGKey(0), tmpl_cfg)
            pretrained = load_pretrained(cfg.pretrained, tmpl.params)
        state = create_finetune_state(jax.random.PRNGKey(SEED), fcfg, pretrained)

        if recipe == "uncertainty":
            # rank unlabeled scans by mean prediction entropy and write the
            # `uncertain_idx` ordering file (`exp.py:2966-2981`)
            from gcdlss_tpu.train.uncertainty import rank_uncertain_scans

            unlab_ds = ds_cls(
                cfg.dataset_path, "train", split_indices=split_idx,
                labeled=False, voxel_size=cfg.voxel_size,
                downsampling=cfg.downsampling, augment=False,
                label_mapping=space["label_mapping"],
                unknown_labels=space["unknown_labels"], seed=SEED,
            )
            if cfg.debug:
                unlab_ds.num_files = min(unlab_ds.num_files, 50)
            out_file = os.path.join(
                cfg.checkpoint_dir, f"uncertain_idx_{cfg.experiment}.npy"
            )
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            order, scores = rank_uncertain_scans(
                state.params, state.batch_stats, unlab_ds, fcfg, caps[0],
                out_file,
            )
            print(f"ranked {len(order)} unlabeled scans -> {out_file}; "
                  f"most uncertain: {order[:10].tolist()}")
            return

        if recipe == "finetune_test":
            # ExpRCTest / ExpMixExtraTest: restore a fine-tuned model and
            # sweep NCC thresholds over the validation split
            # (`exp.py:3000-3290`)
            from gcdlss_tpu.eval.sweep import threshold_sweep_test

            mgr = CheckpointManager(
                os.path.join(cfg.checkpoint_dir, cfg.experiment))
            src = CheckpointManager(cfg.checkpoint) if cfg.checkpoint else mgr
            restored = src.restore(state)
            if restored is not None:
                state = restored
            elif cfg.checkpoint:
                raise FileNotFoundError(
                    f"--checkpoint {cfg.checkpoint} has no restorable step"
                )
            else:
                print("WARNING: sweep test without --checkpoint; "
                      "evaluating the fresh (untrained) model.")
            val_ds = ds_cls(
                cfg.dataset_path, "valid", voxel_size=cfg.voxel_size,
                label_mapping=space["label_mapping"],
                unknown_labels=space["unknown_labels"],
            )
            if cfg.debug:
                val_ds.num_files = min(val_ds.num_files, 50)
            known_real = [k for k, v in space["label_mapping"].items()
                          if v != space["unknown_label"]]
            unknown_real = [k for k, v in space["label_mapping"].items()
                            if v == space["unknown_label"]]
            res = threshold_sweep_test(
                state.params, state.batch_stats, val_ds, fcfg,
                space["label_mapping_inv"], known_real, unknown_real,
                subdivide=subdivide_novel, num_workers=cfg.num_workers,
                point_cap=point_cap,
            )
            for t, r in sorted(res.items()):
                print(f"threshold {t}: mIoU={r['mIoU']:.4f} "
                      f"old={r['mIoU_old']:.4f} new={r['mIoU_new']:.4f}")
                logger.log_dict(
                    {f"threshold{t}-valid/{k}": v for k, v in r.items()}, 0)
            return

        # 'finetuning' dataset type = REAL-aug labeled scans
        train_ds = ds_cls(
            cfg.dataset_path, "train", split_indices=split_idx, labeled=True,
            voxel_size=cfg.voxel_size, downsampling=cfg.downsampling,
            augment=True, label_mapping=space["label_mapping"],
            unknown_labels=space["unknown_labels"], resize_aug=True, seed=SEED,
        )
        unlab_ds = None
        if recipe == "finetune_extra":
            unlab_ds = ds_cls(
                cfg.dataset_path, "train", split_indices=split_idx,
                labeled=False, voxel_size=cfg.voxel_size,
                downsampling=cfg.downsampling, augment=True,
                label_mapping=space["label_mapping"],
                unknown_labels=space["unknown_labels"], seed=SEED + 1,
            )
        if cfg.debug:
            train_ds.num_files = min(train_ds.num_files, 50)
            if unlab_ds is not None:
                unlab_ds.num_files = min(unlab_ds.num_files, 50)
        mgr = CheckpointManager(os.path.join(cfg.checkpoint_dir, cfg.experiment))
        state, start_epoch = resume_from_checkpoint(
            mgr, state, cfg.resume_checkpoint)
        nsc = max(cfg.batch_size // 2, 1)
        for epoch in range(start_epoch, cfg.epochs):
            losses = []
            if recipe == "finetune_extra":
                lab_loader = PrefetchLoader(train_ds, nsc, half,
                                            num_workers=cfg.num_workers,
                                            seed=epoch)
                unlab_loader = PrefetchLoader(unlab_ds, nsc, caps[0] - half,
                                              num_workers=cfg.num_workers,
                                              seed=1000 + epoch)
                for sb, ub in zip(lab_loader, unlab_loader):
                    state, m = finetune_extra_train_step(
                        state, voxel_batch_to_device(sb["voxel"]),
                        voxel_batch_to_device(ub["voxel"]), fcfg,
                    )
                    losses.append(float(np.asarray(m["loss"])))
            else:
                loader = PrefetchLoader(train_ds, cfg.batch_size, caps[0],
                                        num_workers=cfg.num_workers, seed=epoch)
                for batch in loader:
                    state, m = finetune_train_step(
                        state, voxel_batch_to_device(batch["voxel"]), fcfg
                    )
                    losses.append(float(np.asarray(m["loss"])))
            avg = float(np.mean(losses)) if losses else float("nan")
            logger.log("train/loss", avg, epoch)
            print(f"epoch {epoch}: loss={avg:.4f}")
            mgr.save(epoch, state)
        save_pretrained(
            os.path.join(cfg.checkpoint_dir, cfg.experiment), state.params
        )

    elif recipe in ("nops", "nops_swav"):
        # NOPS-style single-model discovery loops (`exp.py:5050,4452,4680`)
        from gcdlss_tpu.train.nops import (
            NopsConfig, create_nops_state, nops_train_step, swav_train_step,
        )
        from gcdlss_tpu.train.common import voxel_batch_to_device

        stage, overrides = recipe, mod_overrides
        half = caps[0] // 2
        ncfg = NopsConfig(
            num_labeled_classes=space["num_labeled_classes"],
            num_unlabeled_classes=space["num_unlabeled_classes"],
            num_classes=space["num_classes"],
            unknown_label=space["unknown_label"],
            voxel_caps=caps,
            sup_voxel_cap=half,
            num_sup_scans=max(cfg.batch_size // 2, 1),
            arch=cfg.arch,
            lr=cfg.train_lr,
            momentum=cfg.momentum_for_optim,
            weight_decay=cfg.weight_decay_for_optim,
            use_scheduler=cfg.use_scheduler,
            warmup_epochs=cfg.warmup_epochs,
            min_lr=cfg.min_lr,
            epochs=cfg.epochs,
            steps_per_epoch=max(1, len(split_idx) // max(cfg.batch_size // 2, 1)),
            **overrides,
        )
        pretrained = None
        if cfg.pretrained:
            from gcdlss_tpu.train.pretrain import PretrainConfig, create_pretrain_state

            tmpl_cfg = PretrainConfig(
                num_labeled_classes=space["num_labeled_classes"],
                num_classes=space["num_classes"],
                unknown_label=space["unknown_label"],
                voxel_caps=caps, arch=cfg.arch,
            )
            tmpl = create_pretrain_state(jax.random.PRNGKey(0), tmpl_cfg)
            pretrained = load_pretrained(cfg.pretrained, tmpl.params)
        state = create_nops_state(jax.random.PRNGKey(SEED), ncfg, pretrained)
        common = dict(
            voxel_size=cfg.voxel_size, downsampling=cfg.downsampling,
            augment=True, label_mapping=space["label_mapping"],
            unknown_labels=space["unknown_labels"],
        )
        # 'finetuning'-type labeled scans (REAL aug) + unlabeled complement
        lab_ds = ds_cls(cfg.dataset_path, "train", split_indices=split_idx,
                        labeled=True, resize_aug=(stage == "nops"),
                        seed=SEED, **common)
        unlab_ds = ds_cls(cfg.dataset_path, "train", split_indices=split_idx,
                          labeled=False, seed=SEED + 1, **common)
        if cfg.debug:
            lab_ds.num_files = min(lab_ds.num_files, 50)
            unlab_ds.num_files = min(unlab_ds.num_files, 50)
        mgr = CheckpointManager(os.path.join(cfg.checkpoint_dir, cfg.experiment))
        state, start_epoch = resume_from_checkpoint(
            mgr, state, cfg.resume_checkpoint)
        unsup_cap = caps[0] - half
        nsc = ncfg.num_sup_scans
        for epoch in range(start_epoch, cfg.epochs):
            lab_loader = PrefetchLoader(lab_ds, nsc, half,
                                        num_workers=cfg.num_workers, seed=epoch)
            unlab_loader = PrefetchLoader(unlab_ds, nsc, unsup_cap,
                                          num_workers=cfg.num_workers,
                                          seed=1000 + epoch)
            losses = []
            if stage == "nops_swav":
                # second view: SAME shuffle seeds -> same scans in the same
                # order; each __getitem__ call draws augmentation fresh, so
                # the two views are independent augmentations of the same
                # scans (the reference's swav_wrapper_ssl calls the dataset
                # twice per index, `utils/dataset_remission.py:2572-2599`)
                lab2 = PrefetchLoader(lab_ds, nsc, half,
                                      num_workers=cfg.num_workers,
                                      seed=epoch)
                unlab2 = PrefetchLoader(unlab_ds, nsc, unsup_cap,
                                        num_workers=cfg.num_workers,
                                        seed=1000 + epoch)
                for sb, ub, sb2, ub2 in zip(lab_loader, unlab_loader, lab2, unlab2):
                    state, m = swav_train_step(
                        state, voxel_batch_to_device(sb["voxel"]),
                        voxel_batch_to_device(ub["voxel"]),
                        voxel_batch_to_device(sb2["voxel"]),
                        voxel_batch_to_device(ub2["voxel"]), ncfg,
                    )
                    losses.append(float(np.asarray(m["loss"])))
            else:
                for sb, ub in zip(lab_loader, unlab_loader):
                    state, m = nops_train_step(
                        state, voxel_batch_to_device(sb["voxel"]),
                        voxel_batch_to_device(ub["voxel"]), ncfg,
                    )
                    losses.append(float(np.asarray(m["loss"])))
            avg = float(np.mean(losses)) if losses else float("nan")
            logger.log("train/loss", avg, epoch)
            print(f"epoch {epoch}: loss={avg:.4f}")
            mgr.save(epoch, state)
        save_pretrained(
            os.path.join(cfg.checkpoint_dir, cfg.experiment), state.params
        )

    elif recipe == "discover":
        from gcdlss_tpu.train.discover import DiscoverConfig, make_discover_config
        from gcdlss_tpu.train.modules import (
            ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive,
        )
        half = caps[0] // 2
        # every Merge-family variant (threshold ablations, LiON, Sinkhorn
        # assigner) is a config recipe on the same jitted step — resolve it
        # from the registry like the reference's substring dispatch
        # (`/root/reference/main.py:172-293`) resolves class names
        discover_kw = resolve_discover_overrides(cfg.module, cfg.dataset)
        if cfg.arch == "Cylinder3D":
            # queue width = 4 x base_channels (see discover.make_model)
            discover_kw.setdefault("feat_dim", 128)
        dcfg = DiscoverConfig(
            num_labeled_classes=space["num_labeled_classes"],
            num_unlabeled_classes=space["num_unlabeled_classes"],
            num_classes=space["num_classes"],
            unknown_label=space["unknown_label"],
            voxel_caps=caps,
            sup_voxel_cap=half,
            mix_voxel_caps=caps,
            num_sup_scans=cfg.batch_size // 2,
            point_cap=point_cap,
            voxel_size=cfg.voxel_size,
            arch=cfg.arch,
            lr=cfg.train_lr,
            momentum=cfg.momentum_for_optim,
            weight_decay=cfg.weight_decay_for_optim,
            use_scheduler=cfg.use_scheduler,
            warmup_epochs=cfg.warmup_epochs,
            min_lr=cfg.min_lr,
            epochs=cfg.epochs,
            steps_per_epoch=max(1, len(split_idx) // max(cfg.batch_size // 2, 1)),
            **discover_kw,
        )
        pretrained = None
        if cfg.pretrained and cfg.arch == "Cylinder3D":
            # Cylinder3D pretrains come from train/cylinder.py (its own
            # param tree); use the discovery state itself as the template
            from gcdlss_tpu.train.discover import create_discover_state

            tmpl = create_discover_state(jax.random.PRNGKey(0), dcfg)
            pretrained = load_pretrained(cfg.pretrained, tmpl.params_s)
        elif cfg.pretrained:
            from gcdlss_tpu.train.pretrain import PretrainConfig, create_pretrain_state

            tmpl_cfg = PretrainConfig(
                num_labeled_classes=space["num_labeled_classes"],
                num_classes=space["num_classes"],
                unknown_label=space["unknown_label"],
                voxel_caps=caps,
                arch=cfg.arch,
            )
            tmpl = create_pretrain_state(jax.random.PRNGKey(0), tmpl_cfg)
            pretrained = load_pretrained(cfg.pretrained, tmpl.params)

        mgr = CheckpointManager(os.path.join(cfg.checkpoint_dir, cfg.experiment))
        label_dict = {
            tid: space["meta"]["labels"][raw]
            for tid, raw in space["meta"]["learning_map_inv"].items()
            if tid >= 0
        }
        module = ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive(
            dcfg, space["label_mapping"], space["label_mapping_inv"],
            pretrained_params=pretrained, logger=logger, checkpoint_manager=mgr,
            label_dict=label_dict,
        )
        if cfg.resume_checkpoint:
            restored = mgr.restore(module.state)
            if restored is not None:
                module.state = restored

        common = dict(
            voxel_size=cfg.voxel_size, downsampling=cfg.downsampling,
            augment=True, label_mapping=space["label_mapping"],
            unknown_labels=space["unknown_labels"],
        )
        # PolarMix-MT mixes labeled scans dataset-side
        # (`exp_merge_mean_teacher.py:278-303`: polarmix=True labeled only)
        lab_ds = ds_cls(cfg.dataset_path, "train", split_indices=split_idx,
                        labeled=True, resize_aug=True, seed=SEED,
                        polarmix="PolarMix" in cfg.module, **common)
        unlab_ds = ds_cls(cfg.dataset_path, "train", split_indices=split_idx,
                          labeled=False, seed=SEED + 1, **common)
        val_ds = ds_cls(cfg.dataset_path, "valid", voxel_size=cfg.voxel_size,
                        label_mapping=space["label_mapping"],
                        unknown_labels=space["unknown_labels"])
        if cfg.debug:
            lab_ds.num_files = min(lab_ds.num_files, 200)
            unlab_ds.num_files = min(unlab_ds.num_files, 200)
            val_ds.num_files = min(val_ds.num_files, 50)
        if cfg.test:
            # test mode must evaluate a *restored* model, not the fresh state
            # (reference `main.py:144-167` always loads a checkpoint for test)
            src = CheckpointManager(cfg.checkpoint) if cfg.checkpoint else mgr
            restored = src.restore(module.state)
            if restored is not None:
                module.state = restored
            elif cfg.checkpoint:
                raise FileNotFoundError(
                    f"--checkpoint {cfg.checkpoint} has no restorable step"
                )
            elif not cfg.resume_checkpoint:
                print(
                    "WARNING: --test without --checkpoint and no saved state; "
                    "evaluating the fresh (untrained) model."
                )
            print(module.validate(val_ds, cfg.num_workers))
            return
        history = module.fit(
            lab_ds, unlab_ds, val_ds, epochs=cfg.epochs,
            num_workers=cfg.num_workers,
        )
        for rec in history[-3:]:
            print(rec)
    else:
        raise NameError(f"Unknown module {cfg.module}")


if __name__ == "__main__":
    main(parser.parse_args())
