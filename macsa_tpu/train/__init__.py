from macsa_tpu.train import optim, state, steps, metrics  # noqa: F401
