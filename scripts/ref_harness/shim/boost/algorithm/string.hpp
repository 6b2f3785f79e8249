// Shim for the two boost::algorithm uses in the reference's kmer.cc
// (boost::split + boost::is_any_of, kmer.cc:352,421).
#ifndef CK_REF_SHIM_ALGO_STRING_HPP
#define CK_REF_SHIM_ALGO_STRING_HPP

// Transitive includes real boost supplies that the reference sources
// rely on (<sstream> for kmer.cc's split, <cmath> for parallel_read's
// ceil, <fstream> for its ifstream).
#include <cmath>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>
using std::ceil;

namespace boost {

struct is_any_of_pred {
    std::string chars;
    bool operator()(char c) const {
        return chars.find(c) != std::string::npos;
    }
};

inline is_any_of_pred is_any_of(const std::string &chars) {
    return is_any_of_pred{chars};
}

template <class Seq, class Pred>
void split(Seq &out, const std::string &s, Pred pred) {
    out.clear();
    std::string cur;
    for (char c : s) {
        if (pred(c)) {
            out.push_back(cur);
            cur.clear();
        } else {
            cur.push_back(c);
        }
    }
    out.push_back(cur);
}

}  // namespace boost

#endif
