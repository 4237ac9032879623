from .fg_io import (read_factor_graph_from_file, write_factor_graph_to_file,
                    factor_graph_to_string)
from .runbatch import (graph_file_parser,
                       group_nodes_factors_incrementally,
                       inc_var_factor_to_dead_reckoning)
from .caesar import export_caesar_script, write_caesar_script
from .g2o import G2oToroPoseGraphReader
