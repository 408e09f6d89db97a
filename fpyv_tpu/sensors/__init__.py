"""Sensor models: gyro noise, barometric altimeter, IMU observation, UWB range.

The reference's sensor models live in experiment scripts
(tests/rotation_pid.py gyro noise, tests/height_pressure_calculator.py and
tests/baro_max_altitude_test01.py barometer, components.py:248 IMU obs,
components.py:287 UWB clamp). Here they are pure batched functions composing
with any env (BASELINE config #3: "sensor-model envs").
"""

from fpyv_tpu.sensors.gyro import gyro_noise_rotation, perturb_attitude  # noqa: F401
from fpyv_tpu.sensors.baro import (  # noqa: F401
    BaroParams,
    altitude_from_pressure,
    pressure_from_altitude,
    baro_measure,
    quadratic_fit_reference,
    is_peak_altitude,
)
from fpyv_tpu.sensors.uwb import uwb_range  # noqa: F401
from fpyv_tpu.sensors.imu import imu_observation  # noqa: F401
