from .money import dec, dec_lit, to_double  # noqa: F401
