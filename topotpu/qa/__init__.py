from topotpu.qa.qa_temp import run_qa_non_spatial, run_qa_spatial  # noqa: F401
from topotpu.qa.qa_location import check_coordinates, check_elevation  # noqa: F401
