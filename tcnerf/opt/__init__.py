from .schedules import warmup_constant_schedule, exponential_decay  # noqa: F401
