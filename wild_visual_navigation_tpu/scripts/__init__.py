from .postprocess_logger import MissionLogger
from .smart_carrot import CarrotConfig, select_carrot
