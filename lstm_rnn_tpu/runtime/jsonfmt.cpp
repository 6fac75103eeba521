// Fast JSON serialization of big float64 arrays for network checkpoints.
//
// The reference writes checkpoints with rapidjson from C++
// (TrainableLayer.cu:212-248, main.cpp:701-741); the Python json encoder
// spends ~1.5 us per float on shortest-repr formatting, which at LVCSR
// scale (10k-state softmax, ~5M weights -> >100 MB JSON) makes every
// --autosave cost many seconds of pure host serialization. std::to_chars
// produces the same shortest round-trip decimal form ~20x faster.
//
// Contract: lrt_format_f64_array writes "[v1,v2,...]" (no spaces) into
// `out` and returns the byte count, or -1 if `cap` could be exceeded
// (caller sizes cap >= 25*n + 2: max shortest f64 repr is 24 chars).
// Non-finite values are emitted as NaN / Infinity / -Infinity, matching
// Python's json.dump(allow_nan=True) so the fallback and native paths
// parse identically. Integral values get a trailing ".0" so every element
// parses back as a JSON float (to_chars prints 1.0 as "1").

#include <charconv>
#include <cmath>
#include <cstring>

extern "C" {

long long lrt_format_f64_array(const double* a, long long n, char* out,
                               long long cap) {
    if (cap < 25 * n + 2) return -1;
    char* p = out;
    *p++ = '[';
    for (long long i = 0; i < n; ++i) {
        if (i) *p++ = ',';
        double v = a[i];
        if (std::isnan(v)) {
            std::memcpy(p, "NaN", 3);
            p += 3;
        } else if (std::isinf(v)) {
            if (v < 0) *p++ = '-';
            std::memcpy(p, "Infinity", 8);
            p += 8;
        } else {
            char* start = p;
            auto res = std::to_chars(p, p + 24, v);
            p = res.ptr;
            // ensure a float-looking token ("1" -> "1.0"); exponents and
            // decimal points already mark the token as a float
            bool plain = true;
            for (char* q = start; q < p; ++q)
                if (*q == '.' || *q == 'e' || *q == 'E') { plain = false; break; }
            if (plain) {
                *p++ = '.';
                *p++ = '0';
            }
        }
    }
    *p++ = ']';
    return p - out;
}

}  // extern "C"
