"""The user-facing ``Filter`` class.

API parity with the reference ``gcm_filters.Filter``
(/root/reference/gcm_filters/filter.py:294-529): same constructor arguments,
validation/error contract, ``.apply`` / ``.apply_to_vector`` / ``.plot_shape``
methods — plus TPU-native extensions: an explicit compute ``dtype``, optional
fused Pallas stepping, and 2-D spatial sharding over a ``jax.sharding.Mesh``
with halo exchange (see :mod:`gcm_filters_tpu.parallel`).

Inputs are jax/numpy arrays with the spatial dims last (``(..., y, x)``,
latitude first — dimension order matters for anisotropic grids), plain dicts
of arrays (the Dataset analogue), or xarray objects when xarray is installed.
"""
from __future__ import annotations

import dataclasses
import warnings
from dataclasses import field as dc_field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .engine import make_jitted_scalar_apply, make_jitted_vector_apply
from .filter_spec import (
    FilterShape,
    TargetSpec,
    compute_filter_spec,
    compute_n_steps_default,
    target_function,
)
from .models.grids import GridType, is_area_weighted, is_vector_grid, required_grid_vars
from .ops.laplacians import build_operator



def _validate_dims(dims, required: bool = False):
    """Normalize/validate the `dims` argument (two spatial dim names).

    One definition serves every entry point (.apply xarray/dict paths and
    .apply_to_vector) so the contract cannot drift between them.
    """
    if dims is None:
        if required:
            raise ValueError("xarray inputs require the `dims` argument")
        return None
    dims = tuple(dims)
    if len(dims) != 2:
        raise ValueError("`dims` must name exactly two spatial dimensions")
    return dims


def _maybe_xarray():
    try:
        import xarray as xr  # optional dependency

        # reject stand-ins (the parity test harness stubs an `xarray`
        # module with bare Dataset/DataArray classes for isinstance checks)
        if not hasattr(xr, "apply_ufunc"):
            return None
        return xr
    except ImportError:
        return None


@dataclasses.dataclass
class Filter:
    """A diffusion-based smoothing filter for gridded data.

    Parameters
    ----------
    filter_scale : float
        The filter scale (meaning depends on the filter shape).
    dx_min : float
        The smallest grid spacing, in the same units as ``filter_scale``.
    filter_shape : FilterShape
        GAUSSIAN — target response exp(-(k filter_scale)^2 / 24);
        TAPER — unity below the transition band, zero above the cutoff.
    transition_width : float
        Nondimensional width of the TAPER transition region (> 1).
    ndim : int
        Dimensionality of the Laplacian's grid.
    n_steps : int
        Number of Chebyshev steps; 0 selects the default heuristic.
    grid_type : GridType
        Which grid discretization / Laplacian to use.
    grid_vars : dict
        Grid variables required by ``grid_type``
        (see :func:`required_grid_vars`).

    TPU-native extensions
    ---------------------
    dtype : optional jnp dtype
        Compute precision. ``None`` follows the input's dtype.
    use_pallas : optional bool
        Force the fused Pallas TPU step kernel on/off. ``None`` = auto
        (enabled on TPU backends when supported for the grid type).
    mesh, spatial_axes :
        A ``jax.sharding.Mesh`` plus the two mesh-axis names to shard the
        (y, x) spatial dims over, enabling the halo-exchange domain
        decomposition. ``None`` axis entries leave that dim unsharded.
    """

    filter_scale: float
    dx_min: float
    filter_shape: FilterShape = FilterShape.GAUSSIAN
    transition_width: float = np.pi
    ndim: int = 2
    n_steps: int = 0
    grid_type: GridType = GridType.REGULAR
    grid_vars: dict = dc_field(default_factory=dict, repr=False)
    dtype: Optional[jnp.dtype] = None
    use_pallas: Optional[bool] = None
    mesh: Optional[jax.sharding.Mesh] = dc_field(default=None, repr=False)
    spatial_axes: Tuple[Optional[str], Optional[str]] = (None, None)
    batch_axis: Optional[str] = None
    halo_steps: Optional[int] = None  # Chebyshev steps per halo exchange round
    # Exact wet-cell NaN semantics on the fused Pallas path: by default a
    # NaN at a WET cell stays NaN but its n_steps-neighborhood treats it as
    # zero initial data (h-space mask elimination; the XLA engine is always
    # exact). exact_nan=True streams the per-step mask through the kernel
    # instead, reproducing the reference's re-scrub-every-step semantics at
    # the cost of one extra coefficient stream (~10%).
    exact_nan: bool = False
    # A user-built operator instead of a registry grid type — the
    # reference's "define your own Laplacian" extension path
    # (kernels.py:43-87, docs/how_to_contribute.rst). Two tiers:
    #   * framework stencil types (ops.stencil.ScalarStencil5,
    #     BGridVectorStencil, CGridVectorOperator): full machinery — fused
    #     Pallas passes, mesh sharding, halo exchange — for any radius-1
    #     operator expressed in the stencil representation;
    #   * free-form protocol operators (subclass BaseScalarOperator /
    #     BaseVectorOperator, or any object with prepare/__call__/finalize):
    #     arbitrary math (9-point, biharmonic, ...) through the XLA engine,
    #     single-device only (mesh= rejects them).
    # grid_type/grid_vars are ignored when this is set.
    custom_operator: Optional[object] = dc_field(default=None, repr=False)

    def __post_init__(self):
        # grid_type/grid_vars are ignored with a custom operator, so its
        # grid-derived validations are skipped too (review finding: the
        # area-weighted dx_min check used to fire off the ignored enum).
        if self.custom_operator is None:
            # The reference's first act is the kernel-registry lookup — an
            # unknown grid type is a KeyError before any other validation
            # (reference filter.py: `ALL_KERNELS[self.grid_type]`).
            if not isinstance(self.grid_type, GridType):
                raise KeyError(self.grid_type)
            # Fixed-factor (area-weighted) filtering happens on the
            # unit-spacing transformed grid, so dx_min must be 1
            # (reference filter.py:340-346).
            if is_area_weighted(self.grid_type) and self.dx_min != 1:
                raise ValueError(
                    "Provided Laplacian is for simple fixed factor filtering, "
                    "where transformed field is filtered on a regular grid with "
                    "dx = dy = 1. dx_min must be set to 1."
                )

        if self.transition_width <= 1:
            raise ValueError("Transition width must be > 1.")

        if self.ndim > 2:
            if self.n_steps < 3:
                raise ValueError("When ndim > 2, you must set n_steps manually")
            n_steps_default = self.n_steps  # no default heuristic beyond 2-D
        else:
            n_steps_default = compute_n_steps_default(
                self.ndim,
                self.filter_shape,
                self.filter_scale,
                self.dx_min,
                self.transition_width,
            )

        if self.n_steps < 3:
            self.n_steps = n_steps_default

        if self.n_steps < n_steps_default:
            warnings.warn(
                "You have set n_steps below the default. Results might not be accurate.",
                stacklevel=2,
            )

        self.filter_spec = compute_filter_spec(
            self.filter_scale,
            self.dx_min,
            self.filter_shape,
            self.transition_width,
            self.ndim,
            self.n_steps,
        )

        # Build the grid operator (validates grid_vars names and physics),
        # unless the user supplied one directly.
        if self.custom_operator is not None:
            from .ops.custom import operator_is_vector
            from .ops.stencil import (
                BGridVectorStencil,
                CGridVectorOperator,
                ScalarStencil5,
            )

            self.operator = self.custom_operator
            self._is_vector = operator_is_vector(self.operator)
            if self.mesh is not None and not isinstance(
                self.operator,
                (ScalarStencil5, BGridVectorStencil, CGridVectorOperator),
            ):
                raise ValueError(
                    "Free-form (protocol) custom operators cannot be sharded "
                    "with mesh=: the engine cannot know their communication "
                    "pattern. Express the operator as a framework stencil "
                    "type (ScalarStencil5 / BGridVectorStencil / "
                    "CGridVectorOperator) to use the mesh machinery, or drop "
                    "mesh= to run it single-device."
                )
        else:
            self.operator = build_operator(self.grid_type, self.grid_vars)
            self._is_vector = is_vector_grid(self.grid_type)

        # Compiled entry points (built lazily, cached per Filter instance).
        self._jitted_scalar = None
        self._jitted_vector = None

    # -- compiled paths ------------------------------------------------------

    def _scalar_fn(self):
        if self._jitted_scalar is None:
            if self.mesh is not None:
                from .parallel.sharded import make_sharded_scalar_apply

                self._jitted_scalar = make_sharded_scalar_apply(
                    self.operator,
                    self.filter_spec,
                    self.mesh,
                    self.spatial_axes,
                    use_pallas=self.use_pallas,
                    batch_axis=self.batch_axis,
                    halo_steps=self.halo_steps,
                    exact_nan=self.exact_nan,
                )
            else:
                self._jitted_scalar = make_jitted_scalar_apply(
                    self.operator, self.filter_spec,
                    use_pallas=self.use_pallas, exact_nan=self.exact_nan,
                )
        return self._jitted_scalar

    def _vector_fn(self):
        if self._jitted_vector is None:
            if self.mesh is not None:
                from .parallel.sharded import make_sharded_vector_apply

                self._jitted_vector = make_sharded_vector_apply(
                    self.operator,
                    self.filter_spec,
                    self.mesh,
                    self.spatial_axes,
                    use_pallas=self.use_pallas,
                    batch_axis=self.batch_axis,
                    halo_steps=self.halo_steps,
                )
            else:
                self._jitted_vector = make_jitted_vector_apply(
                    self.operator, self.filter_spec, use_pallas=self.use_pallas
                )
        return self._jitted_vector

    def _operator_name(self) -> str:
        return "custom_operator" if self.custom_operator is not None else str(self.grid_type)

    @property
    def grid_ds(self):
        """The grid variables as a dataset (reference filter.py:393).

        An ``xarray.Dataset`` when xarray is installed (the reference's
        exact attribute type); otherwise a plain dict copy — xarray is an
        optional dependency here. Grid variables supplied as DataArrays
        keep their own dim names; plain 2-D arrays get the default
        ``("y", "x")`` labels.
        """
        xr = _maybe_xarray()
        if xr is not None:
            def entry(v):
                if hasattr(v, "dims"):  # DataArray: preserve the user's dims
                    return v
                if np.ndim(v) == 2:
                    return (("y", "x"), np.asarray(v))
                return v

            return xr.Dataset({k: entry(v) for k, v in self.grid_vars.items()})
        return dict(self.grid_vars)

    def _coerce(self, arr):
        x = jnp.asarray(arr)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return x

    # -- public API ----------------------------------------------------------

    def plot_shape(self, ax=None):
        """Plot the target filter response and its Chebyshev approximation."""
        import matplotlib.pyplot as plt

        spec = self.filter_spec
        F = target_function(
            self.filter_shape,
            TargetSpec(spec.s_max, self.filter_scale, self.transition_width),
        )
        t = np.linspace(-1, 1, 10001)
        k = np.sqrt(spec.s_max * (t + 1) / 2)
        if ax is None:
            _, ax = plt.subplots()
        ax.plot(k, F(t), color="tab:blue", label="target filter", linewidth=2.5)
        ax.plot(
            k,
            np.polynomial.chebyshev.chebval(t, spec.p),
            color="tab:orange",
            linestyle="--",
            label=f"Chebyshev approximation (n_steps={self.n_steps})",
            linewidth=2.5,
        )
        ax.axvline(
            2 * np.pi / self.filter_scale,
            color="0.3",
            linestyle=":",
            label="filter cutoff wavenumber",
        )
        # Zoom to the transition band when the grid resolves scales far
        # below the cutoff; otherwise the interesting region is a sliver.
        ax.set_xlim(left=0)
        if self.filter_scale / self.dx_min > 10:
            ax.set_xlim(right=4 * np.pi / self.filter_scale)
        ax.set_ylim(bottom=-0.1, top=1.1)
        ax.set_xlabel("wavenumber k")
        ax.set_ylabel("filter response")
        ax.grid(True, alpha=0.4)
        ax.legend()
        return ax

    def apply(self, ds, dims: Optional[Sequence[str]] = None):
        """Filter data with a scalar Laplacian.

        Parameters
        ----------
        ds : array, dict of arrays, xarray.DataArray, or xarray.Dataset
            Data to filter. Arrays must have the spatial dims last, latitude
            first among them (``(..., y, x)``); leading dims are batched.
            For dicts/Datasets every variable carrying both spatial dims is
            filtered; everything else passes through unchanged.
        dims : sequence of str, optional
            Names of the two spatial dimensions (xarray inputs only).
            Dimension order matters: latitude first.
        """
        if self._is_vector:
            raise ValueError(
                f"Provided Laplacian {self._operator_name()} is a vector Laplacian. "
                "The ``.apply`` method is only suitable for scalar Laplacians."
            )

        xr = _maybe_xarray()
        if xr is not None and isinstance(ds, (xr.DataArray, xr.Dataset)):
            return self._apply_xarray(ds, dims)

        if isinstance(ds, dict):
            return self._apply_dict(ds, dims)

        return self._scalar_fn()(self._coerce(ds))

    def _apply_dict(self, ds: Dict, dims: Optional[Sequence[str]] = None):
        """Dataset-analogue semantics on a plain dict of arrays.

        Entries may be plain arrays or ``(array, dims_tuple)`` pairs naming
        each array's dimensions. With ``dims`` (the two spatial dim names),
        named entries are selected by *dimension names* exactly like the
        reference's Dataset path (reference filter.py:454-467): filtered iff
        they carry both names, which must be the trailing two dims in order
        (latitude first). Plain arrays are selected by trailing shape against
        the grid's spatial shape. Grids without 2-D grid variables (e.g.
        REGULAR) carry no intrinsic shape; if plain entries then disagree on
        their trailing 2-D shape, selection would silently depend on dict
        insertion order, so that case raises — name the dims instead.
        """
        named = {}
        plain = {}
        for key, var in ds.items():
            if (
                isinstance(var, tuple)
                and len(var) == 2
                and not np.isscalar(var[0])
                and isinstance(var[1], (tuple, list))
                and all(isinstance(d, str) for d in var[1])
            ):
                named[key] = var
            else:
                plain[key] = var
        if named and dims is None:
            raise ValueError(
                "Dict entries with named dims ((array, dims) pairs) require "
                "the `dims` argument naming the two spatial dimensions."
            )
        dims = _validate_dims(dims)

        ny_nx = self._spatial_shape()
        if ny_nx is None:
            shapes = {
                tuple(np.shape(v)[-2:])
                for v in plain.values()
                if np.ndim(v) >= 2
            }
            if len(shapes) > 1:
                raise ValueError(
                    f"Ambiguous dict input: variables have multiple distinct "
                    f"trailing 2-D shapes {sorted(shapes)} and grid type "
                    f"{self._operator_name()} carries no grid variables to "
                    f"disambiguate. Pass entries as (array, dims) pairs with "
                    f"the `dims` argument to name the spatial dimensions."
                )
            ny_nx = shapes.pop() if shapes else None

        filtered = {}
        any_filtered = False
        for key, var in ds.items():
            if key in named:
                arr, var_dims = named[key]
                var_dims = tuple(var_dims)
                if all(d in var_dims for d in dims):
                    if var_dims[-2:] != dims:
                        raise ValueError(
                            f"Variable {key!r} has spatial dims {dims} but "
                            f"not as its trailing two dimensions in order "
                            f"(latitude first); transpose it to "
                            f"(..., {dims[0]}, {dims[1]})."
                        )
                    # preserve the (array, dims) form so the output dict can
                    # round-trip through .apply with its dims metadata intact
                    filtered[key] = (
                        self._scalar_fn()(self._coerce(arr)), var_dims
                    )
                    any_filtered = True
                else:
                    filtered[key] = (arr, var_dims)
                continue
            arr = np.asarray(var) if not isinstance(var, jax.Array) else var
            if arr.ndim >= 2 and tuple(arr.shape[-2:]) == ny_nx:
                if named:
                    # The user is already naming dims on other entries; a
                    # bare array selected purely by coincidental trailing
                    # shape (e.g. a (ny, nx) parameter table) is the one
                    # case the reference's Dataset path cannot get wrong —
                    # xarray always has dim names. Don't filter it silently.
                    warnings.warn(
                        f"Variable {key!r} is selected for filtering only "
                        f"because its trailing shape matches the grid "
                        f"{ny_nx}. Other entries name their dims "
                        f"explicitly; pass {key!r} as an (array, dims) "
                        f"pair too so selection is by dimension names, "
                        f"not coincidental shape.",
                        stacklevel=2,
                    )
                filtered[key] = self._scalar_fn()(self._coerce(arr))
                any_filtered = True
            else:
                filtered[key] = var
        if not any_filtered:
            warnings.warn(
                "No variables in the dataset had all of the given "
                "dimensions, so nothing was filtered.",
                stacklevel=2,
            )
        return filtered

    def _spatial_shape(self) -> Optional[Tuple[int, int]]:
        for name in required_grid_vars(self.grid_type):
            v = self.grid_vars.get(name)
            if v is not None and np.ndim(v) >= 2:
                return tuple(np.shape(v)[-2:])
        return None

    def _apply_xarray(self, ds, dims):
        import xarray as xr

        dims = _validate_dims(dims, required=True)

        if isinstance(ds, xr.Dataset):
            filtered = ds.copy(deep=True)
            any_filtered = False
            for key, var in filtered.variables.items():
                if all(d in var.dims for d in dims):
                    filtered[key] = self._apply_xr_dataarray(var, dims)
                    any_filtered = True
            if not any_filtered:
                warnings.warn(
                    f"No variables in the dataset had all of the given "
                    f"dimensions ({dims}), so nothing was filtered.",
                    stacklevel=2,
                )
            return filtered
        return self._apply_xr_dataarray(ds, dims)

    def _apply_xr_dataarray(self, da, dims):
        import xarray as xr

        fn = self._scalar_fn()

        def _np_fn(x):
            return np.asarray(fn(self._coerce(x)))

        out_dtype = np.dtype(self.dtype) if self.dtype is not None else da.dtype
        return xr.apply_ufunc(
            _np_fn,
            da,
            input_core_dims=[dims],
            output_core_dims=[dims],
            output_dtypes=[out_dtype],
            dask="parallelized",
        )

    def apply_streamed(self, data, chunk: int = 16):
        """Filter an out-of-core batch by streaming leading-dim chunks.

        The device-memory analogue of the reference's dask batching
        (reference filter.py:478-486 + docs/basic_filtering.rst:175-203):
        ``data`` may be any array-like (numpy, memory-mapped, zarr array)
        with shape ``(batch..., y, x)`` too large for device memory; chunks
        of ``chunk`` slices are transferred, filtered on device, and
        returned as one numpy array.
        """
        if self._is_vector:
            raise ValueError(
                f"Provided Laplacian {self._operator_name()} is a vector Laplacian. "
                "The ``.apply_streamed`` method is only suitable for scalar Laplacians."
            )
        shape = data.shape
        if len(shape) < 3:
            return np.asarray(self.apply(np.asarray(data)))
        lead = shape[:-2]
        n = int(np.prod(lead))
        if n == 0:
            # JAX promotion, matching what the non-empty path returns
            # (numpy's result_type promotes int32+f32 to f64 — review
            # finding: the two paths disagreed on integer inputs)
            from .engine import _compute_dtype

            out_dtype = np.dtype(self.dtype) if self.dtype is not None else \
                np.dtype(_compute_dtype(getattr(data, "dtype", np.float64)))
            return np.empty(shape, dtype=out_dtype)
        fn = self._scalar_fn()
        out = None
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            if len(lead) == 1:
                # one contiguous range read per chunk — the chunked-store
                # friendly access pattern this method exists for
                block = np.asarray(data[start:stop])
            else:
                idx = np.unravel_index(np.arange(start, stop), lead)
                block = np.stack([np.asarray(data[tuple(i[j] for i in idx)])
                                  for j in range(stop - start)])
            res = np.asarray(fn(self._coerce(block)))
            if out is None:
                out = np.empty(shape, dtype=res.dtype)
            out.reshape((n,) + shape[-2:])[start:stop] = res
        return out

    def apply_to_vector_streamed(self, ufield, vfield, chunk: int = 16):
        """Filter an out-of-core (u, v) batch by streaming leading-dim chunks.

        Vector twin of :meth:`apply_streamed` — the device-memory analogue
        of the reference's chunked-dask ``apply_to_vector`` (reference
        filter.py:518-527): ``ufield``/``vfield`` may be any array-likes
        (numpy, memory-mapped, zarr arrays) of equal shape
        ``(batch..., y, x)`` too large for device memory; chunks of
        ``chunk`` slice pairs are transferred, filtered on device, and
        returned as two numpy arrays.
        """
        if not self._is_vector:
            raise ValueError(
                f"Provided Laplacian {self._operator_name()} is a scalar Laplacian. "
                "The ``.apply_to_vector_streamed`` method is only suitable "
                "for vector Laplacians."
            )
        shape = tuple(ufield.shape)
        if tuple(vfield.shape) != shape:
            raise ValueError(
                "ufield and vfield must have the same shape; got "
                f"{shape} and {tuple(vfield.shape)}"
            )
        if len(shape) < 3:
            fu, fv = self.apply_to_vector(np.asarray(ufield),
                                          np.asarray(vfield))
            return np.asarray(fu), np.asarray(fv)
        lead = shape[:-2]
        n = int(np.prod(lead))
        if n == 0:
            from .engine import _compute_dtype

            out_dtype = np.dtype(self.dtype) if self.dtype is not None else \
                np.dtype(_compute_dtype(
                    getattr(ufield, "dtype", np.float64),
                    getattr(vfield, "dtype", np.float64)))
            return (np.empty(shape, dtype=out_dtype),
                    np.empty(shape, dtype=out_dtype))
        fn = self._vector_fn()
        out_u = out_v = None
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            if len(lead) == 1:
                bu = np.asarray(ufield[start:stop])
                bv = np.asarray(vfield[start:stop])
            else:
                idx = np.unravel_index(np.arange(start, stop), lead)
                sel = [tuple(i[j] for i in idx) for j in range(stop - start)]
                bu = np.stack([np.asarray(ufield[s]) for s in sel])
                bv = np.stack([np.asarray(vfield[s]) for s in sel])
            ru, rv = fn(self._coerce(bu), self._coerce(bv))
            ru, rv = np.asarray(ru), np.asarray(rv)
            if out_u is None:
                out_u = np.empty(shape, dtype=ru.dtype)
                out_v = np.empty(shape, dtype=rv.dtype)
            out_u.reshape((n,) + shape[-2:])[start:stop] = ru
            out_v.reshape((n,) + shape[-2:])[start:stop] = rv
        return out_u, out_v

    def apply_to_vector(self, ufield, vfield, dims: Optional[Sequence[str]] = None):
        """Filter a vector field (u, v) with a vector Laplacian.

        Dimension order matters: latitude first among the spatial dims.
        """
        if not self._is_vector:
            raise ValueError(
                f"Provided Laplacian {self._operator_name()} is a scalar Laplacian. "
                "The ``.apply_to_vector`` method is only suitable for vector Laplacians."
            )

        xr = _maybe_xarray()
        if xr is not None and isinstance(ufield, xr.DataArray):
            dims = _validate_dims(dims, required=True)
            fn = self._vector_fn()

            def _np_fn(u, v):
                fu, fv = fn(self._coerce(u), self._coerce(v))
                return np.asarray(fu), np.asarray(fv)

            out_dtype = (np.dtype(self.dtype) if self.dtype is not None
                         else ufield.dtype)
            return xr.apply_ufunc(
                _np_fn,
                ufield,
                vfield,
                input_core_dims=2 * [dims],
                output_core_dims=2 * [dims],
                output_dtypes=[out_dtype, out_dtype],
                dask="parallelized",
            )

        return self._vector_fn()(self._coerce(ufield), self._coerce(vfield))
