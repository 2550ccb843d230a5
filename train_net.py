#!/usr/bin/env python
"""Training / evaluation CLI.

Rebuild of the reference's ``train_net.py`` (Trainer + launch): single
process drives all local TPU devices through a jitted, mesh-sharded train
step (the reference spawns one DDP process per GPU, ``train_net.py:303-313``).

Usage:
  python train_net.py --config-file configs/simplebsl_online_R50.yaml
  python train_net.py --config-file ... --eval-only --weights ckpt_dir
  python train_net.py --config-file ... solver.max_iter=100  # overrides
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("openvis_tpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--weights", default="", help="checkpoint dir or pretrained msgpack")
    p.add_argument("--max-videos", type=int, default=None, help="eval video cap")
    p.add_argument("--profile-dir", default="",
                   help="dump a jax.profiler trace of train steps 10-12 here "
                        "(TensorBoard/Perfetto; utils/profiling.trace)")
    # multi-host rendezvous (reference launch(num_machines, machine_rank,
    # dist_url), train_net.py:303-313); on TPU pods all three may be omitted
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize (multi-host)")
    p.add_argument("--coordinator", default="", help="coordinator host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("opts", nargs="*", help="dotted config overrides a.b=c")
    return p.parse_args()


def load_clip_tree(ca):
    """Resolve ``clip_adapter.weights`` to the converted CLIP param pytree.

    Accepts a pre-converted ``.msgpack``, a local torch ``.pt``, an OpenAI
    model name ("ViT-B/16"), or a URL — the latter three route through the
    rank-0-fetch-then-barrier loader (reference ``build_clip_model``,
    ``clip_adapter/utils.py:69-81``).
    """
    from openvis_tpu.models.clip.build import build_clip_params

    return build_clip_params(ca.weights)


def build_text_bank(cfg):
    from openvis_tpu.models.clip.model import CLIPTextEncoder, _MODEL_SHAPES
    from openvis_tpu.models.clip.prompts import get_templates
    from openvis_tpu.models.clip.text_bank import TextEmbeddingBank
    from openvis_tpu.models.clip.tokenizer import SimpleTokenizer

    ca = cfg.model.clip_adapter
    shape = _MODEL_SHAPES[ca.clip_model_name]
    enc = CLIPTextEncoder(
        width=shape["text_width"], heads=shape["text_heads"],
        layers=shape["text_layers"], embed_dim=shape["embed_dim"],
        vocab_size=shape.get("vocab_size", 49408),
        context_length=shape.get("context_length", 77),
    )
    if not ca.weights:
        raise SystemExit(
            "model.clip_adapter.weights must point to a converted CLIP "
            "msgpack (tools/convert_weights.py clip ...), a torch .pt "
            "checkpoint, or an OpenAI model name (e.g. ViT-B/16)"
        )
    tree = load_clip_tree(ca)
    tokenizer = SimpleTokenizer(ca.bpe_vocab)
    templates = get_templates(ca.prompt_name, ca.predefined_templates)
    return TextEmbeddingBank(enc, tree["text"], tokenizer, templates)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.distributed or args.coordinator:
        from openvis_tpu.parallel.mesh import init_distributed

        init_distributed(
            args.coordinator or None, args.num_processes, args.process_id
        )

    from openvis_tpu.checkpoint import (
        load_params_from_checkpoint,
        merge_pretrained,
        restore_checkpoint,
        save_checkpoint,
    )
    from openvis_tpu.config import load_config
    from openvis_tpu.data import catalog
    from openvis_tpu.data.loader import TrainLoader
    from openvis_tpu.engine import evaluate_dataset, verify_expected_results
    from openvis_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        put_global,
        replicated,
    )
    from openvis_tpu.parallel.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from openvis_tpu.train import init_model, make_loss_fn

    cfg = load_config(args.config_file, args.opts)
    out_dir = cfg.output_dir
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    # class names of the training taxonomy (simplebsl.py:50-57)
    train_info = catalog.get(cfg.datasets.train[0])
    class_names = list(train_info.thing_classes)
    k = len(class_names)

    bank = build_text_bank(cfg)
    text_feats = bank.encode(class_names)

    # the global batch shards over the data axis: use at most ims_per_batch
    # devices, and require divisibility (reference build.py:26-35 asserts
    # the same; failing later inside device_put is much harder to read)
    # mesh layout from ParallelConfig: data_axis -1 fills all (remaining)
    # devices; time_axis > 1 adds a ("data", "time") axis the batch/window
    # axes fold over (mesh.py make_mesh).  The clamp applies BEFORE the
    # divisibility check so the check validates the FINAL device count.
    par = cfg.parallel
    t_ax = max(1, par.time_axis)
    if args.eval_only:
        n_dev = len(jax.devices())     # eval shards window groups
        if par.data_axis != -1:
            n_dev = min(n_dev, par.data_axis * t_ax)
    else:
        n_dev = min(len(jax.devices()), max(1, cfg.solver.ims_per_batch))
        if par.data_axis != -1:
            n_dev = min(n_dev, par.data_axis * t_ax)
        if cfg.solver.ims_per_batch % n_dev != 0:
            raise SystemExit(
                f"solver.ims_per_batch={cfg.solver.ims_per_batch} must be "
                f"divisible by the {n_dev} devices in the data mesh"
            )
    mesh = make_mesh(n_dev, time=t_ax)
    logger.info(
        "devices: %s (mesh %s uses %d)", jax.devices(), mesh.shape, n_dev
    )

    # init with one sample batch shape; each process loads its slice of the
    # global batch (reference per-rank split, build.py:23-37)
    loader_cfg = cfg
    if jax.process_count() > 1:
        per_proc = cfg.solver.ims_per_batch // jax.process_count()
        assert per_proc * jax.process_count() == cfg.solver.ims_per_batch, (
            "solver.ims_per_batch must divide by process count"
        )
        loader_cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, ims_per_batch=per_proc)
        )
    loader = None if args.eval_only else TrainLoader(
        loader_cfg, seed=cfg.seed + jax.process_index()
    )
    if args.eval_only:
        inp = cfg.input
        sample = {
            "pixels": jnp.zeros(
                (1, inp.sampling_frame_num, *inp.pad_size, 3), jnp.float32
            ),
            "text_feats": jnp.asarray(text_feats),
        }
    else:
        sample = next(iter(loader))
        sample["text_feats"] = jnp.asarray(text_feats)
    model, params = init_model(cfg, jax.random.PRNGKey(cfg.seed), sample)

    # pretrained init: either a converted msgpack (tools/convert_weights.py)
    # or a stage-1 checkpoint DIRECTORY for cross-arch surgery — BriVIS
    # stage 2 grafts the SAN checkpoint's segmenter + clip_adapter onto its
    # fresh init (reference brivis_R50_bs16_6000st.yaml:3, train_net.py:290)
    if cfg.model.weights and os.path.isdir(cfg.model.weights):
        pre = load_params_from_checkpoint(cfg.model.weights)
        if pre is None:
            raise SystemExit(
                f"model.weights dir {cfg.model.weights} has no checkpoint"
            )
        graft = {k: v for k, v in pre.items() if k in params}
        params = merge_pretrained(params, graft)
        logger.info(
            "grafted stage-1 subtrees %s from checkpoint %s",
            sorted(graft), cfg.model.weights,
        )
    elif cfg.model.weights and os.path.exists(cfg.model.weights):
        from tools.convert_weights import load_msgpack

        pre = load_msgpack(cfg.model.weights)
        params = merge_pretrained(params, pre, subtree="segmenter")
        logger.info("loaded pretrained segmenter init from %s", cfg.model.weights)
    if cfg.model.clip_adapter.weights and "clip_adapter" in params:
        clip_tree = load_clip_tree(cfg.model.clip_adapter)
        params["clip_adapter"] = merge_pretrained(
            params["clip_adapter"], {"visual": clip_tree["visual"]}
        )
        logger.info("loaded CLIP visual weights")

    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)

    if args.resume or args.eval_only:
        src = args.weights or ckpt_dir
        if os.path.isfile(src):
            # zero-shot eval with converted-but-untrained weights (msgpack
            # from tools/convert_weights.py) — a supported reference flow;
            # the orbax branch below only restores DIRECTORY layouts
            from tools.convert_weights import load_msgpack

            pre = load_msgpack(src)
            state = state.replace(params=merge_pretrained(state.params, pre))
            logger.info("loaded msgpack weights for eval from %s", src)
        else:
            restored = restore_checkpoint(src, state)
            if restored is not None:
                state = restored
                logger.info("resumed at step %d", int(state.step))
            elif args.eval_only and args.weights:
                raise SystemExit(
                    f"--eval-only --weights {src}: no checkpoint found "
                    "(expected an orbax checkpoint dir or a converted "
                    ".msgpack file) — refusing to evaluate random params"
                )

    if args.eval_only:
        # frozen CLIP visual for mask-crop scoring paths (OpenVIS inference,
        # SimpleBSL ensemble)
        clip_visual_apply = None
        needs_clip_visual = cfg.model.meta_architecture.startswith(
            ("OpenVIS",)
        ) or (
            cfg.model.clip_adapter.clip_ensemble
            and cfg.model.meta_architecture.startswith("SimpleBaseline")
        )
        if needs_clip_visual and not cfg.model.clip_adapter.weights:
            raise SystemExit(
                "this eval needs the frozen CLIP visual tower (OpenVIS "
                "mask-crop scoring / SimpleBaseline clip_ensemble): set "
                "model.clip_adapter.weights to a converted CLIP msgpack, "
                "or disable model.clip_adapter.clip_ensemble"
            )
        if needs_clip_visual:
            # dispatches on clip_adapter.name: plain ViT tower, or the
            # mask-prompted tower for "adapted"/"bg_adapted" (reference
            # build_clip_adapter, modeling/clip_adapter/__init__.py:9-15)
            from openvis_tpu.engine import build_clip_visual

            clip_visual_apply, _ = build_clip_visual(cfg)

        all_expected_ok = True
        for ds in cfg.datasets.test:
            names = list(catalog.get(ds).thing_classes)
            tf = bank.encode(names)
            metrics = evaluate_dataset(
                cfg, model, state.params, ds, tf, args.max_videos,
                clip_visual_apply=clip_visual_apply, mesh=mesh,
            )
            logger.info("%s: %s", ds, json.dumps(metrics))
            with open(os.path.join(out_dir, f"metrics_{ds}.json"), "w") as f:
                json.dump(metrics, f)
            all_expected_ok &= verify_expected_results(
                cfg.model.test.expected_results, ds, metrics
            )
        if not all_expected_ok:  # reference verify_results (train_net.py:295)
            raise SystemExit("evaluation results differ from expected_results")
        return

    # --- train loop ---
    loss_fn = make_loss_fn(cfg, model, k)
    step_fn = jax.jit(make_train_step(loss_fn, tx), donate_argnums=0)
    # BriVIS switches matcher source at half training (brivis.py:183-190)
    step_fn_late = None
    if cfg.model.meta_architecture == "BriVIS":
        step_fn_late = jax.jit(
            make_train_step(
                make_loss_fn(cfg, model, k, brivis_image_matcher=False), tx
            ),
            donate_argnums=0,
        )

    repl = replicated(mesh)
    data = data_sharding(mesh)
    if jax.process_count() == 1:
        state = jax.device_put(state, repl)
    else:  # every process contributes the full replicated state
        state = jax.tree.map(
            lambda x: put_global(x, repl), jax.device_get(state)
        )
    rng = jax.random.PRNGKey(cfg.seed)
    text_dev = put_global(np.asarray(text_feats), repl)

    from openvis_tpu.utils.profiling import StepTimer

    start = int(state.step)
    t0 = time.time()
    timer = StepTimer(os.path.join(out_dir, "metrics.jsonl"))
    # jax.profiler trace of a few steady-state steps (the reference had no
    # in-repo profiler, SURVEY §5; on TPU an XLA trace is the native tool)
    tracing = False
    # skip warmup/compile steps when the run is long enough to afford it
    trace_at = start + (10 if cfg.solver.max_iter - start > 13 else 0)
    for it in range(start, cfg.solver.max_iter):
        if args.profile_dir and it == trace_at:
            jax.profiler.start_trace(args.profile_dir)
            tracing = True
        if tracing and it == trace_at + 3:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            tracing = False
            logger.info("profiler trace written to %s", args.profile_dir)
        batch = next(loader)
        batch = {
            "pixels": put_global(np.asarray(batch["pixels"]), data),
            "targets": jax.tree.map(
                lambda x: put_global(np.asarray(x), data), batch["targets"]
            ),
            "text_feats": text_dev,
        }
        fn = step_fn
        if step_fn_late is not None and it >= cfg.solver.max_iter // 2:
            fn = step_fn_late
        state, metrics = fn(state, batch, rng)
        if (it + 1) % 20 == 0:
            m = {k_: float(v) for k_, v in metrics.items()}
            timer.tick(it + 1, m)
            rate = (it + 1 - start) / (time.time() - t0)
            logger.info("iter %d: %s (%.2f it/s)", it + 1, json.dumps(m), rate)
        if (it + 1) % cfg.solver.checkpoint_period == 0 or (
            it + 1 == cfg.solver.max_iter
        ):
            save_checkpoint(ckpt_dir, it + 1, jax.device_get(state))
            logger.info("saved checkpoint at %d", it + 1)
    if tracing:  # short runs: close the trace rather than leak it
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", args.profile_dir)


if __name__ == "__main__":
    main()
