from .keys import KeyStream, host_key, split_host
from .functions import (theta_to_pipi, sort_pair_lists, none_to_zero,
                        NumpyEncoder, sample_dict_to_array,
                        array_order_to_dict, sample_from_arr,
                        reject_outliers, is_spd)
