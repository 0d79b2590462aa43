from .msda import ms_deform_attn_core  # noqa: F401
