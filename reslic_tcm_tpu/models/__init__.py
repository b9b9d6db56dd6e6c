"""Model registry + factory (reference models/__init__.py:9-116).

models_dict maps the reference's CLI names to constructor entries; get_model
wires per-lambda stanh configs and annealing strategies exactly like the
reference, returning (codec, gaussian_configuration,
annealing_strategy_gaussian, factorized_configuration,
annealing_strategy_factorized).
"""

from __future__ import annotations

from .balle2018 import (
    FactorizedPrior,
    HyperpriorCodec,
    MeanScaleHyperprior,
    ScaleHyperprior,
    make_balle,
)
from .base import ChannelARCodec, ChannelARModule
from .tcm import TCM, make_tcm
from .wacnn import WACNN, make_wacnn
from .stanh.variants import (
    ScaleHyperpriorStanh,
    TCMStanh,
    WACNNStanh,
    make_scale_stanh,
    make_tcm_stanh,
    make_wacnn_stanh,
)
from .gain.gained import (
    GainedMSHyperprior,
    GainedScaleHyperprior,
    GainedWACNN,
    make_gained_hyperprior,
    make_gained_wacnn,
)
from .gain.sc import SCGainedHyperprior, make_sc_gained

models_dict = {
    "tcm": TCM,
    "stanh": TCMStanh,
    "scale_stanh": ScaleHyperpriorStanh,
    "scale_gain": GainedScaleHyperprior,
    "wacnn_gain": GainedWACNN,
    "wacnn_stanh": WACNNStanh,
    "scale_gain_sc": SCGainedHyperprior,
    # framework extras beyond the reference registry
    "wacnn": WACNN,
    "factorized": FactorizedPrior,
    "scale_hyperprior": ScaleHyperprior,
    "mean_scale_hyperprior": MeanScaleHyperprior,
}


def get_model(args, rng=None, input_shape=(256, 256)):
    """Build + init the requested codec (reference models/__init__.py:38-116).

    Returns (codec, gaussian_configuration, annealing_strategy_gaussian,
    factorized_configuration, annealing_strategy_factorized).
    """
    from ..utils.helper import configure_annealings, configure_latent_space_policy

    name = args.model
    if name == "wacnn_stanh":
        gcfg = configure_latent_space_policy(args, multi=len(args.lambda_list) > 1)
        if len(gcfg) < len(args.lambda_list):
            gcfg = gcfg * len(args.lambda_list)
        ann_g = configure_annealings(gcfg[0])
        codec = make_wacnn_stanh(
            gcfg, N=args.N, M=args.M, refinement=args.refinement,
            rng=rng, input_shape=input_shape,
        )
        return codec, gcfg, ann_g, None, None

    if name == "stanh":
        gcfg = configure_latent_space_policy(args, multi=len(args.lambda_list) > 1)
        if len(gcfg) < len(args.lambda_list):
            gcfg = gcfg * len(args.lambda_list)
        ann_g = configure_annealings(gcfg[0])
        codec = make_tcm_stanh(
            gcfg, N=args.N, M=320, rng=rng, input_shape=input_shape
        )
        return codec, gcfg, ann_g, gcfg, configure_annealings(gcfg[0])

    if name == "scale_stanh":
        gcfg = configure_latent_space_policy(args)
        ann_g = configure_annealings(gcfg[0])
        codec = make_scale_stanh(
            gcfg, N=args.N, M=args.M, fact_stanh=True, rng=rng,
            input_shape=input_shape,
        )
        return codec, gcfg, ann_g, gcfg, configure_annealings(gcfg[0])

    if name in ("scale_gain", "scale_gain_sc"):
        if name == "scale_gain_sc":
            codec = make_sc_gained(
                N=args.N, M=args.M, lmbda_list=args.lambda_list, rng=rng,
                input_shape=input_shape,
            )
        else:
            codec = make_gained_hyperprior(
                "scale", N=args.N, M=args.M, lmbda_list=args.lambda_list,
                rng=rng, input_shape=input_shape,
                gain_init_spread=getattr(args, "gain_init_spread", 0.0),
            )
        return codec, None, None, None, None

    if name == "wacnn_gain":
        codec = make_gained_wacnn(
            N=args.N, M=args.M, lmbda_list=args.lambda_list, rng=rng,
            input_shape=input_shape,
            gain_init_spread=getattr(args, "gain_init_spread", 0.0),
        )
        return codec, None, None, None, None

    if name == "wacnn":
        codec = make_wacnn(N=args.N, M=args.M, rng=rng, input_shape=input_shape)
        return codec, None, None, None, None

    if name in ("factorized", "scale_hyperprior", "mean_scale_hyperprior"):
        kind = {
            "factorized": "factorized",
            "scale_hyperprior": "scale",
            "mean_scale_hyperprior": "mean-scale",
        }[name]
        codec = make_balle(kind, N=args.N, M=args.M, rng=rng, input_shape=input_shape)
        return codec, None, None, None, None

    # default: TCM (reference models/__init__.py:111-116). remat keeps the
    # reference training recipe (B=16 at 256^2) inside one v5e's 16 GB HBM.
    codec = make_tcm(
        N=args.N, M=320, config=(2, 2, 2, 2, 2, 2),
        head_dim=(8, 16, 32, 32, 16, 8), drop_path_rate=0.0,
        rng=rng, input_shape=input_shape,
        remat=bool(getattr(args, "remat", True)),
    )
    return codec, None, None, None, None
