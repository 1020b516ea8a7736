from .simulated import write_simulated_sstables
from .pipeline import bulk_load

__all__ = ["write_simulated_sstables", "bulk_load"]
