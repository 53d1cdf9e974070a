"""Unified training CLI for T2S (CoSingle/CoMix) and acoustic (VoSingle/VoMix).

TPU-native port of the reference train.py (89 LoC, Lightning+DDP): same
grouped flags (CoVoMixModel.add_argparse_args, conditional_model.py:38-71;
SpecsDataModule.add_argparse_args, data_module.py:564-610), same defaults
(Adam 1e-4, EMA 0.999, warmup/decay schedule, checkpoint top-k on 'l2'),
but the trainer is a jitted sharded step over a jax Mesh: batch over 'dp',
optional tensor parallel 'tp', FSDP param sharding — XLA emits the grad
all-reduces that DDPPlugin/NCCL did in the reference (train.py:80-85).

Recipes (running_command/*.sh) are reproduced in running_command/ here."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401


def build_argparser():
    p = argparse.ArgumentParser()
    # trainer
    t = p.add_argument_group("Trainer")
    t.add_argument("--log_dir", type=str, default="./logs")
    t.add_argument("--run_name", type=str, default=None)
    t.add_argument("--max_epochs", type=int, default=500)
    t.add_argument("--steps_per_epoch", type=int, default=0, help="0 = full dataset pass")
    t.add_argument("--dp", type=int, default=0, help="data-parallel mesh size (0 = all devices)")
    t.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    t.add_argument("--pp", type=int, default=1, help="pipeline-parallel stages (acoustic only; GPipe over 'pp')")
    t.add_argument("--pp_microbatches", type=int, default=4, help="GPipe microbatches per step")
    t.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches accumulated per optimizer step (DDP-mean "
                        "semantics) — reproduce the reference's 8-GPU global batch "
                        "on fewer chips; --batch_size is the micro-batch size")
    t.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps python-unrolled per jitted dispatch "
                        "(~20%% faster on v5e: XLA software-pipelines across "
                        "step boundaries, NOTES_r5.md §5); single-host "
                        "dp/tp/fsdp only, useful range 2-8")
    t.add_argument("--sp", type=int, default=1, help="sequence-parallel shards (acoustic only; ring attention over 'sp')")
    t.add_argument("--fsdp", action="store_true", help="shard params over dp (ZeRO-style)")
    t.add_argument("--bmuf_sync", type=int, default=0,
                   help="BMUF: local optimizer steps with periodic model sync every N "
                        "steps (fairseq/optim/bmuf.py capability; pure-dp only, 0 = off)")
    t.add_argument("--bmuf_warmup", type=int, default=0, help="BMUF warmup_iterations")
    t.add_argument("--bmuf_momentum", type=float, default=None,
                   help="BMUF block momentum (default 1 - 1/world)")
    t.add_argument("--bf16", action="store_true")
    t.add_argument("--ckpt_every", type=int, default=1000)
    t.add_argument("--eval_every", type=int, default=1000)
    t.add_argument("--num_eval_files", type=int, default=20)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--no_wandb", action="store_true", help="disable the W&B sink (JSONL+TensorBoard always on; W&B needs the wandb package + network)")
    t.add_argument("--max_steps", type=int, default=0, help="stop after N steps (0 = unlimited)")
    t.add_argument("--log_every", type=int, default=50)
    t.add_argument("--multihost", action="store_true",
                   help="bring up jax.distributed across hosts (TPU-pod/SLURM "
                        "auto-detect); --batch_size is then the GLOBAL batch and "
                        "each host loads only its shard")
    t.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port rendezvous (the tcp:// init_method equivalent, "
                        "fairseq/distributed/utils.py:96-156); implies --multihost")
    t.add_argument("--num_processes", type=int, default=None)
    t.add_argument("--process_id", type=int, default=None)
    # model (CoVoMixModel.add_argparse_args parity)
    m = p.add_argument_group("CoVoMixModel")
    m.add_argument("--lr", type=float, default=1e-4)
    m.add_argument("--ema_decay", type=float, default=0.999)
    m.add_argument("--CoVoMix_dim", type=int, default=80)
    m.add_argument("--CoVoMix_num_phoneme_tokens", type=int, default=502)
    m.add_argument("--CoVoMix_depth", type=int, default=8)
    m.add_argument("--CoVoMix_dim_head", type=int, default=64)
    m.add_argument("--CoVoMix_heads", type=int, default=16)
    m.add_argument("--CoVoMix_dim_transformer", type=int, default=1024)
    m.add_argument("--cond_drop_prob", type=float, default=0.0)
    m.add_argument("--lr_scheduler", action="store_true")
    m.add_argument("--total_epochs", type=int, default=500)
    m.add_argument("--wake_up_epochs", type=int, default=15)
    m.add_argument("--decay_start_epoch", type=int, default=30)
    m.add_argument("--text2semantic", action="store_true")
    m.add_argument("--twocondition_twooutput", action="store_true")
    m.add_argument("--twocondition_oneoutput", action="store_true")
    m.add_argument("--text2semantic_tokens", type=int, default=501)
    m.add_argument("--text2semantic_target_depth", type=int, default=4)
    m.add_argument("--text2semantic_source_depth", type=int, default=4)
    m.add_argument("--text2semantic_head", type=int, default=8)
    m.add_argument("--no_source_transformer", action="store_true")
    m.add_argument("--text2semantic_two_output", action="store_true")
    m.add_argument("--num_text_token_ids", type=int, default=30528)
    m.add_argument("--target_transformer_dim", type=int, default=0)
    # data (SpecsDataModule.add_argparse_args parity)
    d = p.add_argument_group("DataModule")
    d.add_argument("--base_dir", type=str, required=True)
    d.add_argument("--dev_base_dir", "--val_dir", type=str, default=None, dest="dev_base_dir",
                   help="held-out eval dir (SpecsDataModule's separate train/val builds, "
                        "data_module.py:589, :720-752). Default: a deterministic 10%% "
                        "file split held out of --base_dir so checkpoint top-k never "
                        "scores training files")
    d.add_argument("--format", type=str, default="hubert_fisher")
    d.add_argument("--batch_size", type=int, default=8)
    d.add_argument("--num_workers", type=int, default=0)
    d.add_argument("--dummy", action="store_true")
    d.add_argument("--random_mask", action="store_true")
    d.add_argument("--bert_vocab", type=str, default=None)
    d.add_argument("--allow_fallback_vocab", action="store_true",
                   help="permit the char-level fallback vocab when no BERT vocab.txt is "
                        "found (smoke runs only — its ids are checkpoint-incompatible)")
    d.add_argument("--seed", type=int, default=0)
    return p


def main():
    args = build_argparser().parse_args()
    if args.bmuf_sync > 0 and (args.tp > 1 or args.pp > 1 or args.sp > 1 or args.fsdp
                               or args.multihost or args.coordinator_address):
        sys.exit("--bmuf_sync is the pure-dp local-steps mode; it composes with "
                 "none of --tp/--pp/--sp/--fsdp/--multihost")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.data.datasets import (CoVoMixDataset, collate_acoustic, collate_t2s,
                                           data_loader, stack_microbatches)
    from covomix_tpu.data.tokenizer import load_covomix_tokenizer
    from covomix_tpu.models import acoustic as A, text2semantic as T
    from covomix_tpu.parallel import multihost as MH
    from covomix_tpu.parallel.mesh import make_mesh
    from covomix_tpu.parallel.train_step import init_sharded_state, make_sharded_train_step, shard_batch
    from covomix_tpu.train import evaluate as E
    from covomix_tpu.train.loop import TrainConfig, acoustic_loss_fn, t2s_loss_fn

    # multi-host rendezvous BEFORE first device use; after this jax.devices()
    # is the global list and the mesh below spans every host's chips
    if args.multihost or args.coordinator_address:
        MH.initialize(args.coordinator_address, args.num_processes, args.process_id,
                      requested=True)
    n_proc = jax.process_count()
    primary = MH.is_primary()

    run_name = args.run_name or f"{'t2s' if args.text2semantic else 'acoustic'}_{int(time.time())}"
    run_dir = os.path.join(args.log_dir, run_name)
    os.makedirs(run_dir, exist_ok=True)
    if primary:
        with open(os.path.join(run_dir, "args.txt"), "w") as f:  # train.py:50-51 parity
            json.dump(vars(args), f, indent=2)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    key = jax.random.PRNGKey(args.seed)

    # ---- model + loss
    if args.text2semantic:
        tgt_dim = args.target_transformer_dim or args.CoVoMix_dim_transformer
        model_cfg = T.T2SConfig(
            dim=args.CoVoMix_dim_transformer, source_depth=args.text2semantic_source_depth,
            target_depth=args.text2semantic_target_depth, heads=args.text2semantic_head,
            num_text_tokens=args.num_text_token_ids, num_semantic_tokens=args.text2semantic_tokens,
            target_dim=tgt_dim, two_output=args.text2semantic_two_output,
            no_source_transformer=args.no_source_transformer, cond_drop_prob=args.cond_drop_prob,
        )
        params = T.init(key, model_cfg)
        loss_fn_core = t2s_loss_fn(model_cfg, dtype=dtype)
    else:
        mode = "two_one" if args.twocondition_oneoutput else ("two_two" if args.twocondition_twooutput else "single")
        model_cfg = A.AcousticConfig(
            dim_in=args.CoVoMix_dim, dim=args.CoVoMix_dim_transformer, depth=args.CoVoMix_depth,
            dim_head=args.CoVoMix_dim_head, heads=args.CoVoMix_heads,
            num_phoneme_tokens=args.CoVoMix_num_phoneme_tokens, mode=mode,
        )
        params = A.init(key, model_cfg)
        loss_fn_core = acoustic_loss_fn(model_cfg, cond_drop_prob=args.cond_drop_prob, dtype=dtype)

    # ---- data
    dataset = CoVoMixDataset(args.base_dir, format=args.format, random_mask=args.random_mask,
                             dummy=args.dummy, seed=args.seed)
    if len(dataset) == 0:
        print(f"no training files found under {args.base_dir} for format={args.format}", file=sys.stderr)
        sys.exit(1)
    # held-out validation (reference dev_base_dir/dev_subset, shuffle_spec
    # False for the val build — data_module.py:734-742); without an explicit
    # dir, hold every 10th file out of training deterministically
    if args.dev_base_dir:
        val_dataset = CoVoMixDataset(args.dev_base_dir, format=args.format,
                                     random_mask=args.random_mask, shuffle_spec=False,
                                     seed=args.seed)
    elif len(dataset.files) >= 10:
        val_files = dataset.files[::10]
        dataset.files = [f for i, f in enumerate(dataset.files) if i % 10]
        # re-derive like __post_init__: the augmentation pool must exclude
        # _1/_2 pair files (their .txt sibling does not exist)
        dataset.short_files = [f for f in dataset.files
                               if not os.path.basename(f).endswith("_1.hubert_code.npy")] or dataset.files
        val_dataset = CoVoMixDataset(args.base_dir, format=args.format,
                                     random_mask=args.random_mask, shuffle_spec=False,
                                     seed=args.seed, files=val_files)
    else:
        val_dataset = dataset  # too few files to split (smoke runs)
        if primary:
            print("note: <10 training files; eval scores training files", file=sys.stderr)
    if len(val_dataset) == 0:
        sys.exit(f"no eval files found under {args.dev_base_dir}")
    # multihost: --batch_size is the GLOBAL batch; each process loads a
    # rank-strided shard of the files and 1/n_proc of the rows
    if args.batch_size % n_proc:
        sys.exit(f"--batch_size {args.batch_size} must divide by {n_proc} processes")
    local_bs = args.batch_size // n_proc
    if n_proc > 1:
        dataset = MH.ProcessShardDataset(dataset)
    # one optimizer step consumes grad_accum micro-batches of local_bs rows
    steps_per_epoch = args.steps_per_epoch or max(
        1, len(dataset) // (local_bs * max(1, args.grad_accum)))
    if args.text2semantic:
        # strict like the generation CLIs: a model trained on the char-fallback
        # ids would decode garbage under the real vocab later
        tok = load_covomix_tokenizer(args.bert_vocab, strict=not args.allow_fallback_vocab)
        collate = lambda items: collate_t2s(items, tok)
    else:
        collate = collate_acoustic
    loader = data_loader(dataset, local_bs, collate, seed=args.seed,
                         num_workers=args.num_workers)

    # ---- mesh + state
    if (args.pp > 1 or args.sp > 1) and args.text2semantic:
        sys.exit("--pp/--sp apply to the acoustic model only")
    if args.pp > 1 and args.sp > 1:
        sys.exit("choose one of --pp / --sp")
    if n_proc > 1 and args.fsdp:
        sys.exit("--fsdp with --multihost needs an all-gather before host "
                 "checkpointing (params are not host-addressable); run multihost "
                 "with replicated params (dp/tp) for now")
    if args.grad_accum > 1 and (args.pp > 1 or args.sp > 1 or args.bmuf_sync or n_proc > 1):
        sys.exit("--grad_accum composes with single-host dp/tp/fsdp only (pp has its "
                 "own microbatching; bmuf accumulates via local steps)")
    spd = max(1, args.steps_per_dispatch)
    if spd > 1 and (args.pp > 1 or args.sp > 1 or args.bmuf_sync or n_proc > 1):
        sys.exit("--steps_per_dispatch composes with single-host dp/tp/fsdp only")
    train_cfg = TrainConfig(lr=args.lr, ema_decay=args.ema_decay, use_lr_schedule=args.lr_scheduler,
                            total_epochs=args.total_epochs, wake_up_epochs=args.wake_up_epochs,
                            decay_start_epoch=args.decay_start_epoch, steps_per_epoch=steps_per_epoch,
                            grad_accum=args.grad_accum)

    def acoustic_split(x):
        return (x[..., -80:], x[..., :-80]) if model_cfg.mode == "two_one" else (x, x)

    pp_unstack = None
    if args.pp > 1:
        from covomix_tpu.parallel import pipeline as PPm
        from covomix_tpu.train.loop import init_train_state

        mesh = PPm.make_pp_mesh(dp=args.dp or len(jax.devices()) // args.pp, pp=args.pp)
        stacked, rest = PPm.stack_layer_params(params, model_cfg)
        params = {"stacked": stacked, "rest": rest}
        p_shard = PPm.pp_param_shardings(mesh, params)
        params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        pp_unstack = lambda tree: PPm.unstack_layer_params(tree["stacked"], tree["rest"], model_cfg)

        def loss_fn_core(p, batch, k):  # noqa: F811 — pipelined acoustic loss
            tgt, cond = acoustic_split(batch["x"])
            return PPm.pp_cfm_loss(p, model_cfg, k, tgt, batch["phonemes"], cond, batch.get("mask"),
                                   mesh=mesh, num_microbatches=args.pp_microbatches,
                                   cond_drop_prob=args.cond_drop_prob, dtype=dtype)
    elif args.sp > 1:
        from covomix_tpu.parallel import ring as R

        mesh = R.make_sp_mesh(dp=args.dp or len(jax.devices()) // args.sp, sp=args.sp)

        def loss_fn_core(p, batch, k):  # noqa: F811 — sequence-parallel acoustic loss
            tgt, cond = acoustic_split(batch["x"])
            return R.cfm_loss_sp(p, model_cfg, k, tgt, batch["phonemes"], cond, batch.get("mask"),
                                 mesh=mesh, cond_drop_prob=args.cond_drop_prob, dtype=dtype)
    else:
        mesh = make_mesh(dp=args.dp or None, tp=args.tp)
    bmuf_mode = args.bmuf_sync > 0
    if bmuf_mode and n_proc > 1:  # flag combos rejected at parse time
        sys.exit("--bmuf_sync is the pure-dp local-steps mode; it does not "
                 "compose with multi-process execution")
    with mesh:
        if args.pp > 1:
            from covomix_tpu.train.loop import init_train_state

            state = init_train_state(params, train_cfg)
            step_fn = make_sharded_train_step(loss_fn_core, train_cfg, mesh, p_shard)
        elif bmuf_mode:
            # local optimizer steps + periodic block sync: divergent per-worker
            # models ride a stacked [ndp, ...] state sharded on 'dp'
            # (parallel/bmuf.py); batches reshape [B, ...] -> [ndp, B/ndp, ...]
            from covomix_tpu.parallel import bmuf as BM
            from covomix_tpu.train.loop import init_train_state

            state0 = init_train_state(params, train_cfg)
            bcfg = BM.BMUFConfig(sync_every=args.bmuf_sync, warmup_steps=args.bmuf_warmup,
                                 block_momentum=args.bmuf_momentum)
            state = BM.stack_for_bmuf(state0, BM.init_bmuf_state(state0.params), mesh)
            _bmuf_step = BM.make_bmuf_train_step(loss_fn_core, train_cfg, bcfg, mesh)
            ndp_b = mesh.shape["dp"]
            if args.batch_size % ndp_b:
                sys.exit(f"--batch_size {args.batch_size} must divide by dp={ndp_b} for --bmuf_sync")

            def step_fn(st, batch, k):
                batch = jax.tree_util.tree_map(
                    lambda x: x.reshape((ndp_b, x.shape[0] // ndp_b) + x.shape[1:]), batch)
                st, m = _bmuf_step(st, batch, k)
                return st, jax.tree_util.tree_map(lambda x: x[0], m)
        else:
            state, p_shard = init_sharded_state(params, train_cfg, mesh,
                                                tp=args.tp > 1 and args.sp == 1, fsdp=args.fsdp)
            if spd > 1:
                from covomix_tpu.parallel.train_step import make_sharded_multi_step

                step_fn = make_sharded_multi_step(loss_fn_core, train_cfg, mesh, p_shard, spd)
            else:
                step_fn = make_sharded_train_step(loss_fn_core, train_cfg, mesh, p_shard)

        start_step = 0
        ckpt_dir = os.path.join(run_dir, "checkpoints")
        # save_last + top-10 on 'l2' (reference train.py:72-76)
        ckpt_mgr = cio.TopKCheckpointer(ckpt_dir, top_k=10, mode="min")

        def _bmuf_ema():
            # TrainState fields ride as a tuple inside the stacked dict;
            # index 2 == ema_params (train/loop.py TrainState)
            return jax.tree_util.tree_map(lambda x: x[0], state["train"][2])

        def save_canonical_ema(step_i: int) -> None:
            """Under --pp the train state stores params in the
            pipeline-stacked {'stacked','rest'} layout (resume needs it
            pp-local); generation CLIs and non-pp runs expect the canonical
            {'layers': [...]} tree. Write a sidecar ema_canonical.npz in the
            interchange layout so a pp-trained model loads everywhere."""
            if pp_unstack is not None:
                cio.save_params(os.path.join(ckpt_dir, "ema_canonical.npz"),
                                pp_unstack(jax.device_get(state.ema_params)),
                                meta={"step": step_i, "config": model_cfg.__dict__})
            elif bmuf_mode:
                # stacked [ndp, ...] layout -> worker-0 EMA in the canonical
                # tree so generation CLIs load bmuf-trained checkpoints
                cio.save_params(os.path.join(ckpt_dir, "ema_canonical.npz"),
                                jax.device_get(_bmuf_ema()),
                                meta={"step": step_i, "config": model_cfg.__dict__})
        if args.resume:
            latest = cio.latest_step(ckpt_dir)
            if latest is not None:
                state = cio.load_train_state(ckpt_dir, latest, state)
                start_step = latest
                print(f"resumed from step {latest}")

        from covomix_tpu.util.logging_utils import MetricsLogger
        from covomix_tpu.util.watchdog import Watchdog

        # reference train.py:64-69: W&B unless --no_wandb (falls back to the
        # offline sinks with a note when wandb is not installed / no network)
        # sinks only on rank 0: every process constructing a wandb run / TB
        # writer in the shared run_dir would produce P duplicates
        logger = MetricsLogger(run_dir, tensorboard=primary,
                               wandb=primary and not args.no_wandb,
                               wandb_run=args.run_name)
        import atexit

        atexit.register(logger.close)  # crash path: flush TB events too
        total_steps = args.max_steps or args.max_epochs * steps_per_epoch
        t_last, step_last = time.time(), start_step
        watchdog = Watchdog(timeout_s=1800.0, name=run_name)
        watchdog.__enter__()
        def crossed(done: int, every: int) -> bool:
            # "done % every == 0" generalized to a dispatch of spd steps:
            # true iff a multiple of `every` lies in (done - spd, done]
            return done // every > (done - spd) // every

        done = start_step
        for step_i in range(start_step, total_steps, spd):
            if n_proc > 1:
                # host-local rows -> global sharded arrays (no host ever
                # materializes the full global batch)
                batch = MH.global_batch_from_local(mesh, next(loader), args.batch_size)
            elif spd > 1:
                # [K(,A), b, ...]: stack spd per-step batches (each itself a
                # grad_accum stack when accumulating)
                one = (lambda: stack_microbatches([next(loader) for _ in range(args.grad_accum)])) \
                    if args.grad_accum > 1 else (lambda: next(loader))
                batch = shard_batch(mesh, stack_microbatches([one() for _ in range(spd)]),
                                    lead=2 if args.grad_accum > 1 else 1)
            elif args.grad_accum > 1:
                batch = shard_batch(mesh, stack_microbatches(
                    [next(loader) for _ in range(args.grad_accum)]), accum=True)
            else:
                batch = shard_batch(mesh, next(loader))
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
            if spd > 1:  # stacked [K] metrics -> the dispatch's last step
                metrics = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            done = step_i + spd
            watchdog.beat(done)
            if crossed(done, args.log_every) and primary:
                loss = float(metrics["loss"])
                now = time.time()
                sps = (done - step_last) / max(now - t_last, 1e-9)
                t_last, step_last = now, done
                rec = {"epoch": done // steps_per_epoch, "train_loss": loss,
                       "grad_norm": float(metrics["grad_norm"]), "steps_per_sec": round(sps, 3)}
                print(json.dumps({"step": done, **rec}), flush=True)
                logger.log(done, rec)
            eval_metric = None
            if args.num_eval_files and crossed(done, args.eval_every):
                # split on EVERY rank: `key` feeds the globally-jitted train
                # step as a replicated input, so a primary-only split would
                # desynchronize it across hosts from the next step on
                key, sub = jax.random.split(key)
            if args.num_eval_files and crossed(done, args.eval_every) and primary:
                eval_items = [val_dataset[i % len(val_dataset)]
                              for i in range(min(args.num_eval_files, len(val_dataset)))]
                eval_batches = [collate(eval_items[i : i + args.batch_size]) for i in range(0, len(eval_items), args.batch_size)]
                # eval swaps EMA in (conditional_model.py:203-217); bmuf state
                # is the stacked dict -> worker-0 slice (identical across
                # workers right after a sync, representative between syncs)
                ema = jax.device_get(_bmuf_ema() if bmuf_mode else state.ema_params)
                if pp_unstack is not None:
                    ema = pp_unstack(ema)   # pp stacked tree -> canonical params
                if args.text2semantic:
                    ev = E.evaluate_t2s(ema, model_cfg, eval_batches, sub, dtype=dtype)
                else:
                    ev = E.evaluate_acoustic(ema, model_cfg, eval_batches, sub, dtype=dtype)
                print("eval:", json.dumps({k: float(v) for k, v in ev.items()}), flush=True)
                logger.log(done, ev, prefix="eval_")
                eval_metric = float(ev.get("l2", ev.get("loss", next(iter(ev.values())))))
            if (crossed(done, args.ckpt_every) or eval_metric is not None) and primary:
                # rank-0 writes (conditional on process_index; multihost with
                # --fsdp would need a gather here — guarded at startup)
                ckpt_mgr.save(jax.device_get(state), done, metric=eval_metric)
                save_canonical_ema(done)
        watchdog.__exit__()
        # flush TB events (SummaryWriter's writer is a daemon thread with no
        # atexit flush — the last flush_secs of curves would vanish)
        logger.close()

        final_step = max(total_steps, done)  # spd>1 may overshoot by < spd
        if primary:
            ckpt_mgr.save(jax.device_get(state), final_step)
            save_canonical_ema(final_step)
            print(f"done: {final_step} steps -> {ckpt_dir}")


if __name__ == "__main__":
    main()
