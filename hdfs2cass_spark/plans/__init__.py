from .registry import CATALOG, DeclaredQuery, declare, get_queries, get_oracles

# importing the modules registers their queries — ORDER MATTERS: the driver
# hash-compares a bounded prefix of queries(), so modules appended later
# (textembed, round 6) register after the round-5 prefix and cannot displace
# a previously-checked row
from . import catalog as _catalog  # noqa: E402,F401
from . import llm as _llm  # noqa: E402,F401
from . import pipeline as _pipeline  # noqa: E402,F401
from . import compose as _compose  # noqa: E402,F401
from . import textembed as _textembed  # noqa: E402,F401
from . import lm as _lm  # noqa: E402,F401
from . import quality as _quality  # noqa: E402,F401
from . import rag as _rag  # noqa: E402,F401
from . import embqa as _embqa  # noqa: E402,F401
from . import report as _report  # noqa: E402,F401
from . import dsir as _dsir  # noqa: E402,F401
from . import crossdedup as _crossdedup  # noqa: E402,F401
from . import multibench as _multibench  # noqa: E402,F401
from . import eventfunnel as _eventfunnel  # noqa: E402,F401
from . import lines as _lines  # noqa: E402,F401
from . import c4 as _c4  # noqa: E402,F401
from . import paragraphs as _paragraphs  # noqa: E402,F401
from . import sessions as _sessions  # noqa: E402,F401
from . import quality_clf as _quality_clf  # noqa: E402,F401
from . import mmr as _mmr  # noqa: E402,F401
from . import refppl as _refppl  # noqa: E402,F401
from . import rfm as _rfm  # noqa: E402,F401
from . import spans as _spans  # noqa: E402,F401  # round 9: appends oracle row 83
from . import bpe as _bpe  # noqa: E402,F401  # rows-only; spans stays the oracle tail
from . import winnow as _winnow  # noqa: E402,F401  # round 10: oracle rows 85-86
from . import bloom as _bloom  # noqa: E402,F401  # round 10: oracle row 87
from . import semdedup as _semdedup  # noqa: E402,F401  # round 11: SemDeDup
from . import annreport as _annreport  # noqa: E402,F401  # round 11: ANN recall report
from . import audio as _audio  # noqa: E402,F401  # round 12: WAV/PCM audio features
from . import image as _image  # noqa: E402,F401  # round 12: baseline-JPEG features
from . import gifimage as _gifimage  # noqa: E402,F401  # round 13: GIF/LZW features

__all__ = ["CATALOG", "DeclaredQuery", "declare", "get_queries", "get_oracles"]
