from macsa_tpu.utils.logging import setup_logging  # noqa: F401
