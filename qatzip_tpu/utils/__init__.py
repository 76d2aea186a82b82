from qatzip_tpu.utils.logging import QZ_DEBUG, QZ_ERROR, QZ_INFO, QZ_WARN, get_log_level, set_log_level
