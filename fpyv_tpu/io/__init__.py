"""Host-side IO: config files, motor test CSVs, joystick calibration, logs.

The reference's L6 config layer (src/utils/yaml_helper.py, json_helper.py)
plus the motor bench-data parser (src/utils/flight_time_calculator.py:16-40).
Everything here runs on the host at init time; nothing touches the device.
"""

from fpyv_tpu.io.files import json_reader, json_writer, yaml_reader, yaml_writer  # noqa: F401
from fpyv_tpu.io.motor_csv import read_motor_test_report  # noqa: F401
