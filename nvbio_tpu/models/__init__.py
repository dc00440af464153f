"""End-to-end mapper pipelines (the reference's tool layer).

``mapper`` is the flagship: an nvBowtie-style seed-and-extend
short-read aligner (ref: nvBowtie/bowtie2/cuda/best_approx_inl.h
pipeline: seed -> map -> locate -> score -> reduce -> traceback ->
mapq), restructured as fixed-shape jitted JAX stages per SURVEY.md §7.
"""

from .params import MapperParams  # noqa: F401
from .mapper import Mapper, map_batch  # noqa: F401
from .mem_mapper import MemMapper, mem_map_batch  # noqa: F401
from .qgram_mapper import QGramMapper, qgram_map_batch  # noqa: F401
