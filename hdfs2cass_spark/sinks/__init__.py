from .simulated import write_simulated_sstables
from .pipeline import bulk_load
from .bucketed import read_bucketed, write_bucketed

__all__ = ["write_simulated_sstables", "bulk_load", "write_bucketed", "read_bucketed"]
