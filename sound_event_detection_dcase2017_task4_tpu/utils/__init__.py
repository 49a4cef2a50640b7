"""Host utilities: logging, run statistics, plotting (reference:
``utils/utilities.py`` infra symbols; SURVEY.md §2 "Logging utils",
"Statistics container", "Plotting")."""

from .logging_utils import create_folder, create_logging, get_filename
from .statistics import StatisticsContainer

__all__ = ["create_folder", "create_logging", "get_filename",
           "StatisticsContainer"]
