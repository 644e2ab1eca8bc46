"""Typed config system: validation and build round-trips."""
import numpy as np
import pytest

from pyroved_tpu.config import (TrainConfig, VEDConfig, iVAEConfig,
                                jiVAEConfig, ssRegiVAEConfig, ssiVAEConfig)


def test_ivae_config_build():
    cfg = iVAEConfig(data_dim=(8, 8), latent_dim=3, invariances=("r", "t"),
                     dx_prior=0.2)
    m = cfg.build()
    assert m.z_dim == 3 + 3
    assert float(m.t_prior[0]) == pytest.approx(0.2)


def test_config_validation():
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(16,), invariances=("r",))
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(8, 8), invariances=("q",))
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(8, 8), activation="swish")
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(8, 8), sampler_d="poisson")
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(8, 8), kl="exact")
    with pytest.raises(TypeError):
        iVAEConfig(data_dim=(8, 8), cord=1)  # typo is an error, not silence


def test_jivae_ssivae_ssreg_ved_configs_build():
    m = jiVAEConfig(data_dim=(8, 8), discrete_dim=3, invariances=("r",)).build()
    assert m.discrete_dim == 3
    m = ssiVAEConfig(data_dim=(8, 8), num_classes=4).build()
    assert m.num_classes == 4
    m = ssRegiVAEConfig(data_dim=(8, 8), reg_dim=2, regressor_sig=0.2).build()
    assert m.reg_dim == 2 and m.reg_sig == pytest.approx(0.2)
    m = VEDConfig(input_dim=(16, 16), output_dim=(32,),
                  hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,))).build()
    assert m.z_dim == 2


def test_enum_topk_config_field():
    m = jiVAEConfig(data_dim=(8, 8), discrete_dim=5, enum_topk=2).build()
    assert m.enum_topk == 2
    m = ssiVAEConfig(data_dim=(8, 8), num_classes=4, enum_topk=3).build()
    assert m.enum_topk == 3
    # default 0 = exact enumeration, not forwarded as a kwarg
    m = jiVAEConfig(data_dim=(8, 8), discrete_dim=5).build()
    assert m.enum_topk == 0
    with pytest.raises(ValueError):
        jiVAEConfig(data_dim=(8, 8), discrete_dim=3, enum_topk=4)
    with pytest.raises(ValueError):
        ssiVAEConfig(data_dim=(8, 8), num_classes=3, enum_topk=-1)


def test_pixel_chunks_config_field():
    m = iVAEConfig(data_dim=(8, 8), invariances=("r",), pixel_chunks=4).build()
    assert m.pixel_chunks == 4 and m._pixel_mode() == "chunk"
    m = ssiVAEConfig(data_dim=(8, 8), num_classes=3, invariances=("r",),
                     pixel_chunks=2).build()
    assert m.pixel_chunks == 2
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(8, 8), pixel_chunks=2)  # no spatial decoder
    with pytest.raises(ValueError):
        iVAEConfig(data_dim=(8, 8), invariances=("r",), pixel_chunks=-1)


def test_train_config_enum_schedule_field():
    t = TrainConfig(enum_schedule=5)
    assert t.enum_schedule == 5
    with pytest.raises(ValueError):
        TrainConfig(enum_schedule=-1)


def test_train_config_defaults():
    t = TrainConfig()
    assert t.lr == 1e-3 and t.batch_size == 100


def test_ved_config_channels():
    m = VEDConfig(input_dim=(16, 16), output_dim=(32,), input_channels=2,
                  output_channels=3, hidden_dim_e=((4,), (8,)),
                  hidden_dim_d=((8,), (4,))).build()
    assert m.input_channels == 2 and m.output_channels == 3


def test_ivae_config_channels():
    m = iVAEConfig(data_dim=(8, 8), invariances=("r",), channels=3).build()
    assert m.channels == 3 and m.out_shape == (8, 8, 3)


def test_ved_config_compute_dtype():
    m = VEDConfig(input_dim=(16, 16), output_dim=(32,),
                  hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)),
                  compute_dtype="bfloat16").build()
    assert m.compute_dtype == "bfloat16"
    with pytest.raises(ValueError):
        VEDConfig(input_dim=(16, 16), output_dim=(32,), compute_dtype="fp8")
