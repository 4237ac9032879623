from .fg_io import (read_factor_graph_from_file, write_factor_graph_to_file,
                    factor_graph_to_string)
from .runbatch import graph_file_parser, group_nodes_factors_incrementally
from .g2o import G2oToroPoseGraphReader
