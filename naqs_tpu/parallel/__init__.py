from naqs_tpu.parallel.step import (  # noqa: F401
    make_mesh,
    make_sharded_kfac_step,
    make_sharded_sr_step,
    make_sharded_train_step,
)
