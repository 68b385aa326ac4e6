from .phred import phred_err, phred_symbol
from .varmath import mean, var

__all__ = ["phred_err", "phred_symbol", "mean", "var"]
