"""Masking schedules, per-epoch timestep curriculum, and loss weights.

The diffusion "process" of the masked model is a monotone table: at timestep t
(1-indexed), how many pixels are masked (integer-count schedules: log/sigmoid)
or what per-pixel masking probability applies (ratio schedules: linear/
exponential). Tables are precomputed host-side with numpy — the log/sigmoid
schedules deduplicate entries so the final number of steps T is data-dependent,
which jit cannot trace; the resulting fixed-length table is the jitted world's
constant.

Semantics match reference scheduler.py:
  linear      :103-109  np.linspace(1e-3, 1, T) float ratios
  log         :112-127  int pixel counts, dedup via sorted(set(...)),
              :54-55    last entry forced to image_size, ratio = counts/size
  exponential :130-142  base**linspace(0,1,T) / last, float ratios
  sigmoid     :144-170  int counts via logistic, dedup, endpoints forced
  curriculum  :173-192  keep every 2^(scale-section)-th step, last forced to T
  loss weight :780-794  power_base ** linspace(1, 0, T), indexed by *timeindex*
                        (the position within the epoch's used-timestep list, a
                        quirk the trainers rely on — trainer_masked.py:136-138)

Schedule/selection coupling (documented drift in the reference, SURVEY.md §0):
'indexing' pixel selection needs integer counts (log/sigmoid); 'thresholding'
needs float ratios in [0,1] (linear/exponential, and log whose ratio_list is
counts/image_size). Invalid combinations raise here instead of failing deep in
a traced function.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

_INT_SCHEDULES = ("log", "sigmoid")
_RATIO_SCHEDULES = ("linear", "exponential")


def linear_schedule(num_steps: int) -> np.ndarray:
    return np.linspace(1e-3, 1.0, num_steps)


def log_schedule(num_steps: int, image_size: int) -> np.ndarray:
    if num_steps > image_size:
        raise ValueError(
            "Desired to remove number of pixels is greater than the size of input image."
        )
    x = np.linspace(1, image_size, num_steps)
    values = np.log(x)
    values = values - values.min() + 1
    values = values * (image_size / values.max())
    values = np.asarray(values, dtype=int)
    unique_values = sorted(set(values.tolist()))
    counts = np.array(unique_values)
    counts[-1] = image_size  # make sure the last T removes all pixels
    return counts


def exponential_schedule(num_steps: int, base: float) -> np.ndarray:
    lin = np.linspace(0.0, 1.0, num_steps)
    exp = np.asarray(base, dtype=np.float64) ** lin
    return exp / exp[-1]


def sigmoid_schedule(num_steps: int, base: float, image_size: int) -> np.ndarray:
    if num_steps > image_size:
        raise ValueError(
            "Desired to remove number of pixels is greater than the size of input image."
        )
    i = np.arange(num_steps, dtype=np.float64)
    # np.exp saturates to inf for large arguments (logistic -> 0) instead of
    # raising like math.exp — needed at T=4096 where the argument hits ±2048
    with np.errstate(over="ignore"):
        logistic = 1.0 / (1.0 + np.exp(-0.1 * base * (i - num_steps / 2)))
    result = (1 + (image_size - 1) * logistic).astype(int).tolist()
    min_val = min(result)
    result = [v - min_val + 1 for v in result]
    max_val = max(result)
    result = [v * image_size // max_val for v in result]
    result[0] = 1
    result[-1] = image_size
    return np.array(sorted(set(result)))


@dataclasses.dataclass(frozen=True)
class MaskSchedule:
    """Precomputed masking schedule.

    Attributes:
      name: schedule family.
      image_size: H*W of the data.
      num_steps: T after dedup (the reference's updated_ddpm_num_steps).
      table: raw schedule values indexed by t-1 — int pixel counts for
        log/sigmoid, float ratios for linear/exponential (the reference's
        black_area_pixels).
      ratios: the reference's ratio_list — counts/image_size for log, the raw
        table otherwise (for sigmoid this leaves *integer counts* in
        ratio_list; shift magnitudes scale by it, an observable quirk kept).
      select_degrade_pixel: 'indexing' | 'thresholding'.
    """

    name: str
    image_size: int
    num_steps: int
    table: np.ndarray
    ratios: np.ndarray
    select_degrade_pixel: str

    # ------------------------------------------------------------- device views
    @property
    def table_dev(self) -> jnp.ndarray:
        dtype = jnp.int32 if self.name in _INT_SCHEDULES else jnp.float32
        return jnp.asarray(self.table, dtype=dtype)

    @property
    def ratios_dev(self) -> jnp.ndarray:
        return jnp.asarray(self.ratios, dtype=jnp.float32)

    @property
    def reverse_ratios_dev(self) -> jnp.ndarray:
        return jnp.flip(self.ratios_dev, axis=0)

    def degrade_amount(self, timesteps):
        """Per-timestep degradation amount for the configured selection mode.

        1-indexed timesteps -> table[t-1] (reference scheduler.py:88-100):
        'indexing' looks up integer pixel counts in black_area_pixels,
        'thresholding' looks up ratios in ratio_list.
        """
        idx = jnp.asarray(timesteps, dtype=jnp.int32) - 1
        if self.select_degrade_pixel == "indexing":
            return jnp.take(self.table_dev, idx)
        return jnp.take(self.ratios_dev, idx)

    def shift_ratio(self, timesteps):
        """ratio_list[t-1], the shift magnitude scale (scheduler.py:612-732)."""
        idx = jnp.asarray(timesteps, dtype=jnp.int32) - 1
        return jnp.take(self.ratios_dev, idx)

    # ------------------------------------------------------------- curriculum
    def timesteps_for_epoch(self, epoch: int, epoch_length: int, scale: int) -> np.ndarray:
        """Hierarchical per-epoch timestep curriculum (scheduler.py:173-192).

        With scale=1 every timestep is used at every epoch. Otherwise epoch
        space is split into `scale` sections; section s keeps every
        2^(scale-s)-th timestep, and the last kept step is forced to T.
        """
        T = self.num_steps
        section = math.ceil((epoch + 1) / (epoch_length / scale))
        exponent = scale - section
        if exponent < 0:
            # np.power(2, negative int) raises in the reference and falls back
            # to keeping every step (scheduler.py:185-188)
            exponent = 0
        period = 2**exponent
        used = [i for i in range(1, T + 1) if i % period == 0]
        if not used:
            used = [T]
        used[-1] = T
        return np.asarray(used, dtype=np.int32)

    # ------------------------------------------------------------- loss weights
    def loss_weight_table(self, power_base: float) -> jnp.ndarray:
        """power_base ** linspace(1, 0, T) (scheduler.py:780-794)."""
        alpha = jnp.linspace(1.0, 0.0, self.num_steps)
        return jnp.power(jnp.float32(power_base), alpha)

    def loss_weights(self, timeindex, power_base: float):
        """Weights indexed by *timeindex* — the draw position within the
        epoch's used-timestep list, exactly as the reference trainers pass it
        (trainer_masked.py:136-138, trainer_masked_mean_shift.py:148)."""
        table = self.loss_weight_table(power_base)
        return jnp.take(table, jnp.asarray(timeindex, dtype=jnp.int32))


def build_schedule(
    name: str,
    ddpm_num_steps: int,
    data_size: int,
    select_degrade_pixel: str = "indexing",
    schedule_base: float = 10.0,
) -> MaskSchedule:
    """Build the full schedule table host-side (scheduler.py:27-65)."""
    image_size = data_size * data_size

    if name == "linear":
        table = linear_schedule(ddpm_num_steps)
    elif name == "log":
        table = log_schedule(ddpm_num_steps, image_size)
    elif name == "exponential":
        table = exponential_schedule(ddpm_num_steps, schedule_base)
    elif name == "sigmoid":
        table = sigmoid_schedule(ddpm_num_steps, schedule_base, image_size)
    else:
        raise ValueError("Invalid mask ratio scheduler")

    if name == "log":
        ratios = table / image_size
    else:
        ratios = np.asarray(table, dtype=np.float64)

    if select_degrade_pixel == "indexing" and name in _RATIO_SCHEDULES:
        raise ValueError(
            f"select_degrade_pixel='indexing' needs integer pixel-count schedules "
            f"(log/sigmoid); '{name}' produces float ratios. Use 'thresholding'."
        )
    if select_degrade_pixel == "thresholding" and name == "sigmoid":
        raise ValueError(
            "select_degrade_pixel='thresholding' with the sigmoid schedule compares "
            "uniform noise against integer pixel counts (always unmasked); use "
            "'indexing' for sigmoid."
        )
    if select_degrade_pixel not in ("indexing", "thresholding"):
        raise ValueError(f"unknown select_degrade_pixel: {select_degrade_pixel!r}")

    return MaskSchedule(
        name=name,
        image_size=image_size,
        num_steps=len(table),
        table=np.asarray(table),
        ratios=np.asarray(ratios, dtype=np.float64),
        select_degrade_pixel=select_degrade_pixel,
    )
