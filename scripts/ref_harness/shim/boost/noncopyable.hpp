#ifndef CK_REF_SHIM_NONCOPYABLE_HPP
#define CK_REF_SHIM_NONCOPYABLE_HPP
namespace boost {
class noncopyable {
protected:
    noncopyable() = default;
    ~noncopyable() = default;
    noncopyable(const noncopyable &) = delete;
    noncopyable &operator=(const noncopyable &) = delete;
};
}  // namespace boost
#endif
