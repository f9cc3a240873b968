"""Mirror of ``deltalake.warnings`` (reference:
python/deltalake/warnings.py)."""


class ExperimentalWarning(Warning):
    pass
