from .info import make_info, write_info  # noqa: F401


def honor_jax_platforms() -> None:
    """Restore the embedding process's JAX_PLATFORMS intent (the
    reference drivers' ``--device`` analogue): a sitecustomize may force
    ``jax_platforms`` to an accelerator AFTER env parsing, which both
    overrides the caller's choice and can block on accelerator init.
    Safe no-op when the env var is unset or jax is unavailable."""
    import os
    if os.environ.get("JAX_PLATFORMS"):
        try:
            import jax
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
