from naqs_tpu.parallel.step import make_mesh, make_sharded_train_step  # noqa: F401
