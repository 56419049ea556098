from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi, shell_tables  # noqa: F401
