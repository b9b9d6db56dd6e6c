"""Training CLI (reference src/train.py).

Same flag surface (utils/parser.py) and training recipe: epoch loop with a
random rate level per batch, beta-annealing for stanh models, main+aux Adam,
grad clip, ReduceLROnPlateau on the mean per-lambda validation loss, per-
lambda Kodak evaluation, best/very-best checkpointing. The per-batch body
runs as one fused jitted step, data-parallel over all local devices.
"""

from __future__ import annotations

import os
import random
import sys
import time

import numpy as np


def main(argv=None):
    from ..utils.parser import parse_args

    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.coordinator:
        # multi-host SPMD: jax.devices() becomes the global device list and
        # the jitted step is one program over all slices (beyond-parity; the
        # reference has only single-node nn.DataParallel, helper.py:106-113)
        from ..parallel.multihost import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    import jax.numpy as jnp

    from ..data.datasets import ImageFolder, KodakDataset, Loader
    from ..models import get_model
    from ..parallel.mesh import make_mesh, replicate
    from ..training.optimizer import configure_optimizers, set_learning_rate
    from ..training.step import (
        create_train_state,
        make_eval_step,
        make_train_step,
        shard_train_step,
    )
    from ..utils.checkpoint import ReduceLROnPlateau, save_checkpoint, load_checkpoint
    from ..utils.helper import AverageMeter, create_savepath, sec_to_hours
    from ..utils.metrics import compute_msssim

    for arg in vars(args):
        print(arg, ":", getattr(args, arg))

    wandb_run = _maybe_wandb(args) if jax.process_index() == 0 else None

    if args.seed is not None:
        random.seed(int(args.seed))
        np.random.seed(int(args.seed))

    save_path = os.path.join(args.save_path, str(args.lambda_list[-1]))
    os.makedirs(save_path, exist_ok=True)

    patch = tuple(args.patch_size)
    train_ds = ImageFolder(args.dataset, num_images=args.num_images, split="train",
                           patch_size=patch, train=True)
    valid_ds = ImageFolder(args.dataset, num_images=args.num_images_val, split="test",
                           patch_size=patch, train=False)
    # multi-host: batch_size is GLOBAL; each process loads its own rows with
    # a process-distinct shuffle seed and distribute_batch assembles the
    # global sharded array.
    from ..parallel.multihost import (
        distribute_batch,
        is_coordinator,
        local_batch_size,
    )

    local_bs = local_batch_size(args.batch_size)
    train_loader = Loader(train_ds, local_bs,
                          seed=int(args.seed) + jax.process_index(),
                          num_threads=args.num_workers)
    valid_loader = Loader(valid_ds, args.test_batch_size, seed=0, shuffle=False,
                          drop_last=False, num_threads=args.num_workers)
    kodak = None
    if os.path.isdir(args.kodak):
        kodak = KodakDataset(args.kodak)

    codec, gcfg, ann_g, fcfg, ann_f = get_model(args, input_shape=patch)
    if getattr(codec, "approx_init", False):
        raise SystemExit(
            "refusing to train a fast_init (approximate-statistics) model; "
            "build with the faithful initializer (utils/device.py:14-22)"
        )
    module = codec.module

    restored = None
    if args.checkpoint != "none":
        print("Loading", args.checkpoint)
        if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            # PyTorch warm start: a released reference checkpoint or a saved
            # CompressAI-zoo state dict (e.g. bmshj2018_hyperprior). Loaded
            # non-strictly with CDF-key deletion semantics (reference
            # models/__init__.py:25-35,81-90) — the network-download path of
            # the reference's zoo warm start, taken from a local file here.
            from ..utils.torch_convert import warm_start_codec

            warm_start_codec(codec, args.checkpoint)
        else:
            restored = load_checkpoint(args.checkpoint)
            # full training checkpoint ({"state": {...}, "extra": {...}}) or a
            # params-only snapshot restored from checkpoints/*.npz
            # (artifacts/snapshot_ckpt.py --restore writes {"params": ...})
            params = (restored["state"]["params"] if "state" in restored
                      else restored["params"])
            codec.variables = {"params": params}
            if "state" not in restored:
                restored = None  # warm start only: no optimizer state to resume

    n_lam = len(args.lambda_list)
    uniform_quant_init = (
        len(set(args.gauss_num_sigmoids[:n_lam])) <= 1
        and len(set(args.gauss_extrema[:n_lam])) <= 1
    )
    if (is_stanh_name(args.model) and n_lam > 1 and uniform_quant_init
            and all(t != "yes" for t in args.gauss_trainable)):
        # With every per-level quantizer frozen at the (identical) default
        # init, all rate levels compute the same function and the model
        # cannot become variable-rate (reference default is also "no";
        # its multi-rate recipes pass --gauss_trainable yes ...). Per-level
        # staircase inits (distinct extrema/num_sigmoids) are exempt:
        # frozen levels still differ.
        print("WARNING: multi-lambda stanh training with all quantizers "
              "frozen (--gauss_trainable no ...): every level starts from "
              "the same frozen STanH, so the trained model will code "
              "identically at every level. Pass --gauss_trainable "
              + " ".join(["yes"] * len(args.lambda_list))
              + " for a variable-rate model.")

    labels = None
    if args.freeze and is_stanh_name(args.model):
        from ..training.optimizer import freeze_all_but_stanh_labels

        labels = freeze_all_but_stanh_labels(codec.params, g_s_tune=True)
        print("freeze: training only stanh (+ g_s) parameters")
    main_tx, aux_tx = configure_optimizers(
        codec.params, args.learning_rate, float(args.aux_learning_rate),
        args.clip_max_norm, labels=labels,
    )
    state = create_train_state(codec.params, main_tx, aux_tx)
    scheduler = ReduceLROnPlateau(args.learning_rate, "min", factor=0.5, patience=4)
    first_epoch = 0
    if restored is not None and args.continue_train:
        # resume optimizer/scheduler state (the reference leaves this
        # commented out, train.py:192-196; here it works)
        from ..utils.checkpoint import restore_tree

        state = restore_tree(state, restored["state"])
        extra = restored.get("extra") or {}
        if "scheduler" in extra:
            scheduler.load_state_dict(dict(extra["scheduler"]))
        first_epoch = int(extra.get("epoch", -1)) + 1
        print(f"resuming from epoch {first_epoch}, lr={scheduler.lr}")

    lambda_list = list(args.lambda_list)
    is_stanh = "stanh" in args.model
    loss_type = args.type

    import math as _math

    mesh = make_mesh()
    if args.batch_size % mesh.devices.size != 0:
        if jax.process_count() > 1:
            # a narrower mesh would exclude some hosts' devices entirely
            # (unaddressable shardings); demand divisibility instead
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by the "
                f"{mesh.devices.size} global devices in multi-host runs"
            )
        # single process: widest DP the batch divides (1 = no DP)
        mesh = make_mesh(n_data=_math.gcd(args.batch_size, mesh.devices.size))
    n_dev = mesh.devices.size
    precision = "bfloat16" if getattr(args, "bf16", False) else None

    # ONE train-step implementation (training/step.py): lv is a TRACED
    # scalar for every model (stacked per-level params / nn.switch), so one
    # compilation covers every rate level.
    _shared_step = shard_train_step(
        make_train_step(module, main_tx, aux_tx, loss_type,
                        matmul_precision=precision),
        mesh,
    )
    jit_steps = {
        lv: (lambda st, b, lm, r, beta, _lv=lv: _shared_step(
            st, b, lm, r, jnp.int32(_lv), beta))
        for lv in range(len(lambda_list))
    }

    _shared_eval = jax.jit(make_eval_step(module, loss_type))
    jit_evals = {
        lv: (lambda p, b, lm, _lv=lv: _shared_eval(p, b, lm, jnp.int32(_lv)))
        for lv in range(len(lambda_list))
    }

    best_loss = float("inf")
    counter = 0

    if args.tester:
        _validate(jit_evals, state.params, valid_loader, lambda_list, loss_type)
        return 0

    # data-parallel: params replicated, batch sharded over the 'data' axis
    # by the step's in_shardings (XLA inserts the gradient all-reduce;
    # replaces CustomDataParallel, reference train.py:168-169)
    state = replicate(mesh, state)

    def eval_params():
        # The plain-jit eval steps place host inputs on the process-local
        # default device; global-mesh-replicated params would mix device
        # sets in multi-host runs ("incompatible devices"), so fetch a
        # local copy there. Single-process passes the arrays through.
        if jax.process_count() == 1:
            return state.params
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a.addressable_data(0)), state.params
        )

    for epoch in range(first_epoch, args.epochs):
        start = time.time()
        print(f"Learning rate: {scheduler.lr}")
        meters = {k: AverageMeter() for k in ("loss", "bpp_loss", "mse_loss")}

        for i, batch in enumerate(train_loader):
            counter += 1
            p = random.randint(0, len(lambda_list) - 1)
            beta = jnp.float32(ann_g.beta) if (is_stanh and ann_g is not None) else None
            batch_j = distribute_batch(mesh, batch)
            state, metrics = jit_steps[p](
                state, batch_j, jnp.float32(lambda_list[p]),
                jax.random.PRNGKey(counter), beta,
            )
            if is_stanh and ann_g is not None:
                ann_g.step(gap=float(metrics["gap"]), epoch=epoch,
                           loss=float(metrics["loss"]))
            for k in meters:
                if k in metrics:
                    meters[k].update(float(metrics[k]))
            if i % 1000 == 0:
                print(
                    f"Train epoch {epoch}: [{i * len(batch)}/{len(train_ds)}]"
                    f"\tLoss: {float(metrics['loss']):.3f} |"
                    f"\tBpp loss: {float(metrics['bpp_loss']):.2f} |"
                )
            if wandb_run:
                log = {
                    "train_batch": counter,
                    "train_batch/losses_batch": float(metrics["loss"]),
                    "train_batch/bpp_batch": float(metrics["bpp_loss"]),
                }
                if is_stanh and ann_g is not None:
                    log["general_data/gaussian_beta"] = ann_g.beta
                wandb_run.log(log)

        if is_stanh and ann_g is not None:
            # beta trajectory on stdout (the annealing evidence; wandb is
            # optional in this environment)
            print(f"stanh beta after epoch {epoch}: {float(ann_g.beta):.4f}")

        val_loss = _validate(jit_evals, eval_params(), valid_loader, lambda_list,
                             loss_type, epoch=epoch, wandb_run=wandb_run)
        if kodak is not None:
            _validate(jit_evals, eval_params(), kodak, lambda_list, loss_type,
                      epoch=epoch, wandb_run=wandb_run, tag="test")

        new_lr = scheduler.step(val_loss)
        state = state._replace(opt_state=set_learning_rate(state.opt_state, new_lr))

        is_best = val_loss < best_loss
        best_loss = min(val_loss, best_loss)

        if args.save and is_coordinator():
            import re

            check = "pret" if args.checkpoint != "none" else "zero"
            name_folder = (check + args.model + "_" + str(args.N) + "_"
                           + str(args.symmetry) + "_" + str(args.gauss_gp)
                           + "_" + str(args.lambda_list))
            # orbax paths go through tensorstore, which rejects glob
            # metacharacters ([, ]) in kvstore paths
            name_folder = re.sub(r"[\[\]\s,']+", "_", name_folder)
            cartella = os.path.join(args.save_path, name_folder)
            os.makedirs(cartella, exist_ok=True)
            filename, filename_best, very_best = create_savepath(args, epoch, cartella)
            payload_extra = {
                "epoch": epoch,
                "val_loss": float(val_loss),
                "scheduler": scheduler.state_dict(),
            }
            if is_best:
                save_checkpoint(filename_best, state, payload_extra)
                save_checkpoint(very_best, state, payload_extra)
            else:
                save_checkpoint(filename, state, payload_extra)
            # Prune older per-epoch checkpoints: keep _very_best plus the 2
            # most recent epoch files (by mtime — filenames embed the date,
            # so a rerun on a later day must not orphan-and-delete an
            # earlier run's latest). The reference keeps every epoch file
            # (helper.py:55-73); at hundreds of epochs that's tens of GB
            # of optimizer state for no recovery value.
            import shutil

            epochs_on_disk = sorted(
                (e for e in os.listdir(cartella)
                 if e.endswith(".ckpt") and e != os.path.basename(very_best)),
                key=lambda e: os.path.getmtime(os.path.join(cartella, e)),
                reverse=True,
            )
            for entry in epochs_on_disk[2:]:
                shutil.rmtree(os.path.join(cartella, entry),
                              ignore_errors=True)

        codec.variables = {"params": state.params}
        sec_to_hours(time.time() - start)
        print("END OF EPOCH ", epoch)

    return 0


def is_stanh_name(model_name: str) -> bool:
    return "stanh" in model_name


def _validate(jit_evals, params, loader, lambda_list, loss_type, epoch=0,
              wandb_run=None, tag="valid"):
    import jax.numpy as jnp

    from ..ops.math import compute_padding, pad_nhwc
    from ..utils.helper import AverageMeter

    total = 0.0
    for j, lmbda in enumerate(lambda_list):
        loss_m, bpp_m, psnr_m = AverageMeter(), AverageMeter(), AverageMeter()
        for batch in loader:
            # full-resolution eval images must conform to the model's
            # 128px windowing contract (reference pads at eval, eval.py:76)
            h, w = batch.shape[1], batch.shape[2]
            if h % 128 or w % 128:
                pad, _ = compute_padding(h, w, 128)
                batch = pad_nhwc(jnp.asarray(batch), pad)
            out = jit_evals[j](params, jnp.asarray(batch), jnp.float32(lmbda))
            loss_m.update(float(out["loss"]))
            bpp_m.update(float(out["bpp_loss"]))
            psnr_m.update(float(out["psnr"]))
        print(
            f"{tag} epoch {epoch} (lv {j}): Average losses:"
            f"\tLoss: {loss_m.avg:.3f} |"
            f"\tBpp loss: {bpp_m.avg:.2f} |"
            f"\tPSNR: {psnr_m.avg:.2f}"
        )
        if wandb_run:
            wandb_run.log({
                f"{tag}_{j}": epoch,
                f"{tag}_{j}/loss": loss_m.avg,
                f"{tag}_{j}/bpp": bpp_m.avg,
                f"{tag}_{j}/psnr": psnr_m.avg,
            })
        total += loss_m.avg
    return total / len(lambda_list)


def _maybe_wandb(args):
    try:
        import wandb

        if os.environ.get("WANDB_MODE", "") == "disabled":
            return None
        if os.environ.get("WANDB_API_KEY") or os.environ.get("WANDB_MODE") == "offline":
            return wandb.init(project=args.wandb_name)
    except Exception:
        pass
    return None


if __name__ == "__main__":
    sys.exit(main())
