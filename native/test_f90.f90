! Fortran smoke test for the primme_tpu C/Fortran ABI (capi.cpp) — the
! analogue of the reference's Fortran examples (examples/ex_eigs_f77.f,
! tests/testi-*.F): build a 1-D Laplacian in CSR, configure the solver
! through the label-based parameter surface (JDQMR preset + interior
! target, the primme_set_method / primme_set_member F77 shim,
! src/eigs/primme_f77.c), solve, and check the returned pairs against
! the analytic spectrum lambda_i = 2 - 2 cos(i*pi/(n+1)).
!
! Build+run:  make -C native test_f90
!             PYTHONPATH=. JAX_PLATFORMS=cpu ./native/test_f90
program test_f90
  implicit none
  integer, parameter :: n = 120, k = 3
  integer(kind=8) :: indptr(n + 1), indices(3 * n)
  real(kind=8) :: csrdat(3 * n)
  integer(kind=8) :: nnz, h, nn
  real(kind=8) :: evals(k), resnorms(k), evecs(n * k)
  real(kind=8) :: lam, best, d, out
  integer :: i, j, p, ierr, bad
  integer :: ktmp, target
  real(kind=8) :: tol, sigma

  ! tridiagonal (-1, 2, -1) Laplacian in CSR (0-based indices)
  p = 1
  do i = 1, n
     indptr(i) = p - 1
     if (i > 1) then
        indices(p) = i - 2
        csrdat(p) = -1.0d0
        p = p + 1
     end if
     indices(p) = i - 1
     csrdat(p) = 2.0d0
     p = p + 1
     if (i < n) then
        indices(p) = i
        csrdat(p) = -1.0d0
        p = p + 1
     end if
  end do
  indptr(n + 1) = p - 1
  nnz = p - 1
  nn = n
  bad = 0

  ! --- fixed-signature entry point: 3 smallest ------------------------
  ktmp = k
  target = 0          ! primme_smallest
  tol = 1.0d-10
  sigma = 0.0d0
  ierr = -1
  call ptpu_eigsh_csr(nn, nnz, indptr, indices, csrdat, ktmp, target, &
       tol, sigma, evals, evecs, resnorms, ierr)
  if (ierr /= 0) then
     print *, 'ptpu_eigsh_csr ierr =', ierr
     stop 1
  end if
  do i = 1, k
     lam = 2.0d0 - 2.0d0 * cos(3.14159265358979324d0 * i / (n + 1))
     if (abs(evals(i) - lam) > 1.0d-8 .or. resnorms(i) > 1.0d-7) then
        bad = bad + 1
     end if
     print '(a,i0,a,f14.12,a,es9.2)', '  sa eval(', i, ') = ', evals(i), &
          '  rnorm ', resnorms(i)
  end do

  ! --- parameter surface: JDQMR + interior shift ----------------------
  call ptpu_params_create(h)
  if (h <= 0) then
     print *, 'params_create failed'
     stop 1
  end if
  call ptpu_params_set(h, 'numEvals', '3', ierr)
  if (ierr /= 0) stop 2
  call ptpu_params_set(h, 'eps', '1e-10', ierr)
  if (ierr /= 0) stop 2
  call ptpu_params_set(h, 'target', 'primme_closest_abs', ierr)
  if (ierr /= 0) stop 2
  call ptpu_params_set(h, 'targetShifts', '1.2', ierr)
  if (ierr /= 0) stop 2
  call ptpu_params_set_method(h, 'PRIMME_JDQMR', ierr)
  if (ierr /= 0) stop 3
  call ptpu_params_set(h, 'maxBlockSize', '2', ierr)   ! overrides preset
  if (ierr /= 0) stop 2
  out = 0.0d0
  call ptpu_params_get(h, 'maxBlockSize', out, ierr)
  if (ierr /= 0 .or. abs(out - 2.0d0) > 0.0d0) then
     print *, 'params_get maxBlockSize =', out
     stop 4
  end if
  call ptpu_eigsh_run(h, nn, nnz, indptr, indices, csrdat, evals, &
       evecs, resnorms, ierr)
  if (ierr /= 0) then
     print *, 'eigsh_run ierr =', ierr
     stop 5
  end if
  do i = 1, k
     best = 1.0d30
     do j = 1, n
        lam = 2.0d0 - 2.0d0 * cos(3.14159265358979324d0 * j / (n + 1))
        d = abs(evals(i) - lam)
        if (d < best) best = d
     end do
     if (best > 1.0d-8 .or. abs(evals(i) - 1.2d0) > 0.08d0 .or. &
          resnorms(i) > 1.0d-7) then
        bad = bad + 1
     end if
     print '(a,i0,a,f14.12,a,es9.2)', '  run eval(', i, ') = ', evals(i), &
          '  rnorm ', resnorms(i)
  end do
  call ptpu_params_free(h, ierr)
  if (ierr /= 0) stop 6

  if (bad /= 0) then
     print *, 'FAILED checks:', bad
     stop 7
  end if
  print *, 'F90 OK'
end program test_f90
