"""Command-line entry points.

Replaces the reference's module-scope scripts (L7: distill.py + 4 siblings,
eval.py, eval_teacher.py — SURVEY.md section 1) with one CLI:

    python -m speech_enhancement_clskd_tpu distill --strategy clskd [k=v ...]
    python -m speech_enhancement_clskd_tpu pretrain [k=v ...]
    python -m speech_enhancement_clskd_tpu evaluate --bundle path [k=v ...]
    python -m speech_enhancement_clskd_tpu bench

Every config field is overridable as a dotted key=value (config.load_config),
e.g. ``optim.lr=1e-3 data.batch_size=16 distill.strategy=spkd``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional


def _parse(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(prog="speech_enhancement_clskd_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("distill", help="knowledge-distillation training")
    d.add_argument("--config", default=None, help="YAML config file")
    d.add_argument("--strategy", default=None,
                   choices=["clskd", "reviewkd", "spkd", "mse", "stft"])
    d.add_argument("--teacher-bundle", default=None,
                   help="pretrained teacher bundle (.npz)")
    d.add_argument("--out", default="checkpoints",
                   help="checkpoint/bundle output dir")
    d.add_argument("--resume", action="store_true",
                   help="resume from the best checkpoint in --out")
    d.add_argument("overrides", nargs="*", help="dotted key=value overrides")

    t = sub.add_parser("pretrain", help="standalone DCCRN training (teacher)")
    t.add_argument("--config", default=None)
    t.add_argument("--model", default="teacher", choices=["teacher", "student"])
    t.add_argument("--out", default="checkpoints_pretrain")
    t.add_argument("overrides", nargs="*")

    e = sub.add_parser("evaluate", help="offline metric evaluation")
    e.add_argument("--bundle", required=True,
                   help=".npz bundle or asteroid .pth (auto-detected)")
    e.add_argument("--config", default=None)
    e.add_argument("--results", default="results/All_metric.json")
    e.add_argument("--examples", default=None, help="example wav dir")
    e.add_argument("--no-pesq", action="store_true")
    e.add_argument("--per-utt", default=None, dest="per_utt",
                   help="per-utterance metric rows JSONL (default: derived "
                        "from --results)")
    e.add_argument("--reference-bn", action="store_true",
                   help="BatchNorm with per-utterance batch statistics, "
                        "matching the reference eval.py (no model.eval())")
    e.add_argument("overrides", nargs="*")

    i = sub.add_parser(
        "import-torch",
        help="convert an asteroid publishable .pth into a native .npz bundle",
    )
    i.add_argument("--pth", required=True)
    i.add_argument("--out", required=True, help="output bundle path (.npz)")

    b = sub.add_parser("bench", help="train-step throughput bench")
    b.add_argument("overrides", nargs="*")

    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    args = _parse(argv)
    # Respect an explicit JAX_PLATFORMS env var even when a sitecustomize has
    # force-registered a platform via jax.config (e.g. the axon TPU plugin).
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from .config import load_config

    overrides = list(getattr(args, "overrides", []))
    if getattr(args, "strategy", None):
        overrides.append(f"distill.strategy={args.strategy}")
    cfg = load_config(getattr(args, "config", None), overrides)

    if args.command == "distill":
        return _distill(cfg, args)
    if args.command == "pretrain":
        return _pretrain(cfg, args)
    if args.command == "evaluate":
        return _evaluate(cfg, args)
    if args.command == "import-torch":
        return _import_torch(args)
    if args.command == "bench":
        import bench  # repo-root bench.py

        bench.main()
        return 0
    return 2


def _distill(cfg, args) -> int:
    from .train import Trainer
    from .utils import CheckpointManager, save_bundle, student_from_state
    from .utils.observability import MetricWriter

    trainer = Trainer(cfg)
    teacher_vars = None
    if args.teacher_bundle:
        from .utils import load_bundle

        tcfg, tv, _ = load_bundle(args.teacher_bundle)
        if tcfg.kernel_num != cfg.teacher.kernel_num:
            raise SystemExit(
                f"teacher bundle geometry {tcfg.kernel_num} != config "
                f"{cfg.teacher.kernel_num}"
            )
        teacher_vars = tv

    mgr = CheckpointManager(args.out, monitor=cfg.monitor,
                            keep_top_k=cfg.keep_top_k)
    writer = MetricWriter(os.path.join(args.out, "metrics.jsonl"))
    state = None
    if args.resume and mgr.best_step() is not None:
        import jax

        template = trainer.init_state(teacher_variables=teacher_vars)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.device_get(template),
        )
        state = jax.device_put(mgr.restore(abstract))
        print(f"resumed from step {int(state.step)}")
    state, history = trainer.fit(
        state=state,
        teacher_variables=teacher_vars,
        checkpoint_manager=mgr,
        metric_writer=writer,
    )
    # publishable bundle of the BEST student by the monitored metric — the
    # reference reloads the top checkpoint before serializing
    # (distill.py:280-294), not the final epoch's weights
    if mgr.best_step() is not None and int(state.step) != mgr.best_step():
        import jax

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.device_get(state),
        )
        state = mgr.restore(abstract)
        print(f"bundling best checkpoint (step {mgr.best_step()}, "
              f"{cfg.monitor}={mgr.best_score():.4f})")
    bundle_path = os.path.join(args.out, "the_best_model")
    v = student_from_state(state, cfg.student)
    save_bundle(bundle_path, v["params"], v["batch_stats"], cfg.student,
                infos={"history": history, "strategy": cfg.distill.strategy})
    print(json.dumps({"final_metrics": history,
                      "bundle": bundle_path + ".npz"}))
    return 0


def _pretrain(cfg, args) -> int:
    from .train.pretrain import PretrainTrainer
    from .utils import CheckpointManager, save_bundle

    model_cfg = cfg.teacher if args.model == "teacher" else cfg.student
    trainer = PretrainTrainer(cfg, model_cfg=model_cfg)
    mgr = CheckpointManager(args.out, monitor=cfg.monitor,
                            keep_top_k=cfg.keep_top_k)
    state, history = trainer.fit(checkpoint_manager=mgr)
    bundle_path = os.path.join(args.out, f"{args.model}_model")
    import jax

    save_bundle(bundle_path, jax.device_get(state["params"]),
                jax.device_get(state["batch_stats"]), model_cfg,
                infos={"history": history, "loss_mode": cfg.loss_mode})
    print(json.dumps({"final_metrics": history,
                      "bundle": bundle_path + ".npz"}))
    return 0


def _evaluate(cfg, args) -> int:
    from .data import LibriMixDataset, SyntheticEnhancementDataset
    from .eval import evaluate_bundle

    d = cfg.data
    if d.synthetic:
        ds = SyntheticEnhancementDataset(
            size=d.synthetic_size, segment=d.segment,
            sample_rate=d.sample_rate, seed=cfg.seed + 20_000,
            profile=d.synthetic_profile)
    else:
        ds = LibriMixDataset(d.test_dir, d.task, d.sample_rate, d.n_src,
                             segment=None)
    per_utt = getattr(args, "per_utt", None)
    if per_utt is None and args.results:
        per_utt = os.path.splitext(args.results)[0] + "_per_utt.jsonl"
    res = evaluate_bundle(
        args.bundle, ds,
        sample_rate=d.sample_rate,
        ex_save_dir=args.examples,
        results_path=args.results,
        compute_pesq=not args.no_pesq,
        bn_batch_stats=True if args.reference_bn else None,
        per_utt_path=per_utt,
    )
    print(json.dumps(res, indent=2))
    return 0


def _import_torch(args) -> int:
    """Asteroid publishable .pth -> native .npz bundle (pure Python)."""
    from .models.dccrnet import load_reference_bundle
    from .utils import save_bundle
    from .utils.torch_zip import load_torch_checkpoint

    model, variables = load_reference_bundle(args.pth)
    ck = load_torch_checkpoint(args.pth)
    save_bundle(
        args.out,
        variables["params"],
        variables["batch_stats"],
        model.cfg,
        infos={
            "imported_from": args.pth,
            "source_model_name": ck.get("model_name"),
            "source_infos": ck.get("infos", {}),
        },
    )
    print(json.dumps({"bundle": args.out if args.out.endswith(".npz")
                      else args.out + ".npz",
                      "architecture": model.cfg.name}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
