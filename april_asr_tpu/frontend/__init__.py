from .oracle import OracleFbank, mel_banks, povey_window

__all__ = ["OracleFbank", "mel_banks", "povey_window"]
