// Native VectorOfVectors codec for dspeed_tpu.
//
// The reference implements its variable-length <-> padded-dense translation
// as a numba-JITed loop (`_vov2nda`, reference processing_chain.py:2198-2235)
// run per 16-event block. Here the whole chunk (thousands of rows) is packed/
// unpacked in one native call on the host feed path, C-compiled and bound
// via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libvov_codec.so vov_codec.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// flat + cumulative_length -> padded (n_rows, max_len) + lengths.
// Returns 0 on success, 1 if any row exceeds max_len.
int vov_unpack_f32(const float* flat, const uint64_t* starts,
                   const uint64_t* stops, int64_t n_rows, int64_t max_len,
                   float fill, float* padded, uint32_t* lens) {
    int bad = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t len = static_cast<int64_t>(stops[i] - starts[i]);
        if (len > max_len) { bad = 1; }
        const int64_t n = std::min(len, max_len);
        float* row = padded + i * max_len;
        std::memcpy(row, flat + starts[i], n * sizeof(float));
        std::fill(row + n, row + max_len, fill);
        lens[i] = static_cast<uint32_t>(len);
    }
    return bad;
}

int vov_unpack_f64(const double* flat, const uint64_t* starts,
                   const uint64_t* stops, int64_t n_rows, int64_t max_len,
                   double fill, double* padded, uint32_t* lens) {
    int bad = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t len = static_cast<int64_t>(stops[i] - starts[i]);
        if (len > max_len) { bad = 1; }
        const int64_t n = std::min(len, max_len);
        double* row = padded + i * max_len;
        std::memcpy(row, flat + starts[i], n * sizeof(double));
        std::fill(row + n, row + max_len, fill);
        lens[i] = static_cast<uint32_t>(len);
    }
    return bad;
}

// padded (n_rows, max_len) + lengths -> flat + cumulative_length (in-row
// order). `base` is the flat offset of the first row. Returns the total
// flat elements written.
int64_t vov_pack_f32(const float* padded, const int64_t* lens, int64_t n_rows,
                     int64_t max_len, int64_t base, float* flat,
                     uint64_t* cumlen) {
    int64_t cum = base;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t n = std::min(std::max<int64_t>(lens[i], 0), max_len);
        std::memcpy(flat + cum, padded + i * max_len, n * sizeof(float));
        cum += n;
        cumlen[i] = static_cast<uint64_t>(cum);
    }
    return cum - base;
}

int64_t vov_pack_f64(const double* padded, const int64_t* lens,
                     int64_t n_rows, int64_t max_len, int64_t base,
                     double* flat, uint64_t* cumlen) {
    int64_t cum = base;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t n = std::min(std::max<int64_t>(lens[i], 0), max_len);
        std::memcpy(flat + cum, padded + i * max_len, n * sizeof(double));
        cum += n;
        cumlen[i] = static_cast<uint64_t>(cum);
    }
    return cum - base;
}

}  // extern "C"
