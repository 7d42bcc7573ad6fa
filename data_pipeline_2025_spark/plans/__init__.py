from .explain import plan_of  # noqa: F401
